package graft.fpl

import graft.SparkSpec

class DQSpec extends SparkSpec {
  import spark.implicits._

  private def clean = Seq((1, "a"), (2, "b")).toDF("id", "v")

  test("gates pass on clean data") {
    DQ.assertPk(clean, "id", "t")
    DQ.assertNonEmpty(clean, "t")
  }

  test("null-key gate throws") {
    val bad = Seq((Some(1), "a"), (None, "b")).toDF("id", "v")
    assertThrows[DQ.DQException](DQ.assertNoNullKeys(bad, "id", "t"))
  }

  test("duplicate-key gate throws, including composite keys") {
    val bad = Seq((1, "a"), (1, "b")).toDF("id", "v")
    assertThrows[DQ.DQException](DQ.assertNoDuplicateKeys(bad, "t", "id"))
    // composite key (id, v) is unique -> passes
    DQ.assertNoDuplicateKeys(bad, "t", "id", "v")
  }

  test("parse gate throws on null struct") {
    import org.apache.spark.sql.functions._
    val parsed = Seq("""{"k":1}""", "not json").toDF("payload_json")
      .select(from_json($"payload_json",
        org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("j"))
    assertThrows[DQ.DQException](DQ.assertParsed(parsed, "j", "t"))
  }

  test("empty gate throws on empty input") {
    assertThrows[DQ.DQException](
      DQ.assertNonEmpty(clean.filter($"id" > 99), "t"))
  }

  test("report counts rows, null keys and duplicate rows in one pass") {
    val df = Seq(Some(1), Some(1), Some(2), None).toDF("id")
    val r = DQ.report(df, "id", "t")
      .as[(String, Long, Long, Long)].collect().head
    assert(r === (("t", 4L, 1L, 2L)))
  }
}
