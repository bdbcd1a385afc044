package graft.fpl

import graft.SparkSpec

class DQSpec extends SparkSpec {
  import spark.implicits._

  private def clean = Seq((1, "a"), (2, "b")).toDF("id", "v")

  test("expectations split pass/quarantine and tag the broken rules") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1, Some(5)),   // passes both
      (2, Some(-1)),  // breaks v_pos
      (3, None),      // NULL predicate: passes (CHECK semantics)
      (4, Some(99)),  // breaks v_pos AND v_small
    ).toDF("id", "v")
    val (passed, quarantined) = DQ.expectations(df, Seq(
      "v_pos" -> "v > 0 AND v < 90",
      "v_small" -> "coalesce(v, 0) < 50"))
    assert(passed.select("id").as[Int].collect().sorted.toSeq === Seq(1, 3))
    assert(!passed.columns.contains("_failed_expectations"))
    val q = quarantined
      .select($"id", $"_failed_expectations")
      .as[(Int, Seq[String])].collect().toMap
    assert(q === Map(2 -> Seq("v_pos"), 4 -> Seq("v_pos", "v_small")))
    // nothing dropped: the two sides partition the input
    assert(passed.count() + quarantined.count() === df.count())
    // re-validating a quarantine frame must refuse, not clobber verdicts
    intercept[IllegalArgumentException] {
      DQ.expectations(quarantined, Seq("again" -> "true"))
    }
  }

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
