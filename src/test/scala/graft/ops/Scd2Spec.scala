package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private val t1 = lit("2025-01-01 00:00:00").cast("timestamp")
  private val t2 = lit("2025-02-01 00:00:00").cast("timestamp")

  test("changed rows close + reopen; unchanged untouched; new keys insert") {
    val dim = Scd2.init(Seq((1, "a"), (2, "b")).toDF("id", "seg"), t1)
    val out = Scd2.applyBatch(dim,
      Seq((1, "a"), (2, "B2"), (3, "c")).toDF("id", "seg"),
      Seq("id"), Seq("seg"), t2)
    val rows = out.select(col("id"), col("seg"), col("is_current"),
        col("valid_to").isNull.as("open"))
      .as[(Int, String, Boolean, Boolean)].collect().toSet
    assert(rows === Set(
      (1, "a", true, true),    // unchanged: still the t1 version
      (2, "b", false, false),  // closed old version
      (2, "B2", true, true),   // new open version
      (3, "c", true, true)))   // brand-new key
    // unchanged row keeps its ORIGINAL valid_from
    assert(out.filter(col("id") === 1).select("valid_from")
      .as[java.sql.Timestamp].head().toString.startsWith("2025-01-01"))
  }

  test("re-applying the same batch is a no-op (rerun-idempotent)") {
    val dim = Scd2.init(Seq((1, "a"), (2, "b")).toDF("id", "seg"), t1)
    val batch = Seq((2, "B2")).toDF("id", "seg")
    val once = Scd2.applyBatch(dim, batch, Seq("id"), Seq("seg"), t2)
    val twice = Scd2.applyBatch(once, batch, Seq("id"), Seq("seg"), t2)
    assert(twice.collect().toSet === once.collect().toSet)
  }

  test("applyBatchToTable: incremental, equals full applyBatch, COW buckets") {
    val tbl = graft.tables.VersionedTable(spark, tmpDir("scd2-tbl-"))
    val snap = (1 to 64).map(i => (i, s"seg$i")).toDF("id", "seg")
    Scd2.applyBatchToTable(tbl, snap, Seq("id"), Seq("seg"), t1,
      numBuckets = 8)
    val before = tbl.history.last.fileSets
    // one key changes → only its (id, valid_from)-hash buckets rewrite
    Scd2.applyBatchToTable(tbl, snap.withColumn("seg",
        when(col("id") === 5, lit("CHANGED")).otherwise(col("seg"))),
      Seq("id"), Seq("seg"), t2)
    val after = tbl.history.last.fileSets
    val carried = after.toSet.intersect(before.toSet)
    assert(carried.nonEmpty && carried.size >= before.size - 2,
      s"COW merge rewrote too much: before=$before after=$after")
    // content equals the full non-table formulation
    val expected = Scd2.applyBatch(
      Scd2.init(snap, t1),
      snap.withColumn("seg",
        when(col("id") === 5, lit("CHANGED")).otherwise(col("seg"))),
      Seq("id"), Seq("seg"), t2)
      .select("id", "seg", "is_current").as[(Int, String, Boolean)]
      .collect().toSet
    assert(tbl.read.select("id", "seg", "is_current")
      .as[(Int, String, Boolean)].collect().toSet === expected)
  }

  test("NULL transitions count as changes (null-safe compare)") {
    val dim = Scd2.init(Seq((1, Some("a")), (2, None))
      .toDF("id", "seg"), t1)
    val out = Scd2.applyBatch(dim,
      Seq((1, None.asInstanceOf[Option[String]]), (2, Some("x")))
        .toDF("id", "seg"),
      Seq("id"), Seq("seg"), t2)
    assert(out.filter(col("is_current")).count() === 2)
    assert(out.count() === 4) // both keys versioned
  }
}
