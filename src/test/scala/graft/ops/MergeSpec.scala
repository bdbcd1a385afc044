package graft.ops

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0),
  ).toDF("id", "tag", "v")

  test("upsert updates matched, inserts unmatched, passes through the rest") {
    val updates = Seq((2, "B", 200.0), (4, "d", 40.0)).toDF("id", "tag", "v")
    val out = Merge.upsert(target, updates, Seq("id"))
      .as[(Int, String, Double)].collect().toSet
    assert(out === Set((1, "a", 10.0), (2, "B", 200.0), (3, "c", 30.0),
      (4, "d", 40.0)))
  }

  test("delete-marked rows remove matched targets; unmatched tombstones no-op") {
    val updates = Seq(
      (2, "B", 200.0, false),  // plain upsert
      (3, "x", 0.0, true),     // delete the matched target
      (9, "x", 0.0, true),     // tombstone with no match: no-op
      (4, "d", 40.0, false),   // plain insert
    ).toDF("id", "tag", "v", Merge.DeleteCol)
    val out = Merge.upsert(target, updates, Seq("id"))
      .as[(Int, String, Double)].collect().toSet
    assert(out === Set((1, "a", 10.0), (2, "B", 200.0), (4, "d", 40.0)))
    // without the marker column nothing changes (regression guard)
    val plain = Merge.upsert(target,
      Seq((2, "B", 200.0)).toDF("id", "tag", "v"), Seq("id"))
    assert(plain.count() === 3)
  }

  test("an update that nulls a non-key column wins (presence-flag semantics)") {
    val updates = Seq((1, null.asInstanceOf[String], 11.0)).toDF("id", "tag", "v")
    val out = Merge.upsert(target, updates, Seq("id"))
      .filter($"id" === 1).select("tag").collect().head
    assert(out.isNullAt(0))
  }

  test("merge is rerun-idempotent: applying the same updates twice == once") {
    val updates = Seq((2, "B", 200.0), (4, "d", 40.0)).toDF("id", "tag", "v")
    val once = Merge.upsert(target, updates, Seq("id"))
    val twice = Merge.upsert(once, updates, Seq("id"))
    assert(twice.as[(Int, String, Double)].collect().toSet ===
      once.as[(Int, String, Double)].collect().toSet)
  }

  test("schema mismatch is rejected") {
    val bad = Seq((1, "x")).toDF("id", "tag")
    assertThrows[IllegalArgumentException] {
      Merge.upsert(target, bad, Seq("id"))
    }
  }

  test("alignForEvolution pads additive columns with typed nulls, both ways") {
    val t = Seq((1, "a")).toDF("id", "tag")
    val u = Seq((2, "b", 0.5)).toDF("id", "tag", "score") // updates evolved
    val (t2, u2) = Merge.alignForEvolution(t, u)
    assert(t2.columns.toSeq === u2.columns.toSeq)
    val out = Merge.upsert(t2, u2, Seq("id"))
      .as[(Int, String, Option[Double])].collect().toSet
    assert(out === Set((1, "a", None), (2, "b", Some(0.5))))
    // reverse: target has the extra column
    val (t3, u3) = Merge.alignForEvolution(u, t)
    assert(t3.columns.toSeq === u3.columns.toSeq)
    val out2 = Merge.upsert(t3, u3, Seq("id"))
      .as[(Int, String, Option[Double])].collect().toSet
    assert(out2 === Set((1, "a", None), (2, "b", Some(0.5))))
  }

  test("null keys never match (SQL MERGE ON semantics): null update inserts") {
    val t = Seq((Some(1), "a"), (None, "n")).toDF("id", "tag")
    val u = Seq((None.asInstanceOf[Option[Int]], "N")).toDF("id", "tag")
    val out = Merge.upsert(t, u, Seq("id"))
      .select("tag").as[String].collect().toSet
    // NULL-keyed target row survives, NULL-keyed update row is inserted
    assert(out === Set("a", "n", "N"))
  }

  test("updateExprs: WHEN MATCHED combines target and update (incremental counts)") {
    import org.apache.spark.sql.functions._
    val t = Seq(("a", 10L), ("b", 1L)).toDF("k", "cnt")
    val u = Seq(("a", 5L), ("c", 7L)).toDF("k", "cnt")
    val out = Merge.upsert(t, u, Seq("k"),
        updateExprs = Map("cnt" -> ((tc, uc) => tc + uc)))
      .as[(String, Long)].collect().toSet
    // matched a: 10+5; unmatched target b passes; unmatched update c inserts
    assert(out === Set(("a", 15L), ("b", 1L), ("c", 7L)))
  }

  test("updateExprs through VersionedTable.merge: combining, NOT rerun-idempotent") {
    import org.apache.spark.sql.functions._
    val tbl = graft.tables.VersionedTable(spark, tmpDir("vt-incragg-"))
    tbl.merge(Seq(("a", 10L), ("b", 1L)).toDF("k", "cnt"), Seq("k"),
      numBuckets = 4)
    val incr = Seq(("a", 5L), ("c", 7L)).toDF("k", "cnt")
    val plus = Map("cnt" -> ((tc: org.apache.spark.sql.Column,
                              uc: org.apache.spark.sql.Column) => tc + uc))
    tbl.merge(incr, Seq("k"), updateExprs = plus)
    assert(tbl.read.as[(String, Long)].collect().toSet ===
      Set(("a", 15L), ("b", 1L), ("c", 7L)))
    // a combining merge re-applies on rerun BY DESIGN (incremental
    // aggregation) — retry-safety must come from increment dedup upstream
    tbl.merge(incr, Seq("k"), updateExprs = plus)
    assert(tbl.read.as[(String, Long)].collect().toSet ===
      Set(("a", 20L), ("b", 1L), ("c", 14L)))
  }
}
