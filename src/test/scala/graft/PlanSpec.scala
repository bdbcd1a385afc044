package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan contracts: the scale properties SURVEY.md §4 calls out
  * must be visible in the executed plan, not assumed. Uses sf0.001 test
  * data (plan shape is scale-invariant; AQE finalizes at execution). */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("A1 pricing summary: predicate pushed to parquet, columns pruned") {
    val p = plan("q_a1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushed filter:\n$p")
    // only the 6 referenced columns are read, not the full 16-col schema
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_returnflag:string,l_linestatu"))
    assert(p.contains("partial_sum"), "map-side partial aggregation missing")
  }

  test("J1 join dims: every dim side is a broadcast hash join") {
    val p = plan("q_j1_join_dims")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"expected 3 broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), "dim join degraded to sort-merge")
  }

  test("W1 latest-per-key: WindowGroupLimit prunes before the shuffle") {
    val p = plan("q_w1_latest_per_key")
    assert(p.contains("WindowGroupLimit"), s"top-1-per-key not pushed down:\n$p")
    assert("WindowGroupLimit.*Partial".r.findFirstIn(p).isDefined,
      "no map-side (Partial) group limit")
  }

  test("W3 top-k: TakeOrderedAndProject instead of a global sort") {
    val p = plan("q_w3_topk")
    assert(p.contains("TakeOrderedAndProject"), s"plan:\n$p")
  }

  test("filters on a renamed column still push down to the parquet scan") {
    import spark.implicits._
    val t = graft.tables.VersionedTable(spark, tmpDir("plan-rn-"))
    t.append((0 until 1000).map(i => (i, s"v$i")).toDF("k", "v"))
    t.renameColumn("v", "val")
    // the mapping is an alias projection; Catalyst must push a filter on
    // the NEW name through it onto the OLD physical column in the scan —
    // at 100 TB a rename that silenced pushdown would be a full-scan tax
    val p = t.read.filter($"val" === "v7").filter($"k" > 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(v), EqualTo(v,v7), IsNotNull(k), GreaterThan(k,5)]") ||
      (p.contains("EqualTo(v,v7)") && p.contains("GreaterThan(k,5)")),
      s"filter not pushed through the rename projection:\n$p")
    assert(t.read.filter($"val" === "v7").count() === 1L)
  }

  test("text stats: map-only — no shuffle in the whole plan") {
    val p = graft.ops.TextAnalysis.documentStats(
      spark.read.parquet(s"$dir/documents.parquet"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"unexpected shuffle:\n$p")
  }

  test("redaction and hash sampling: map-only, no shuffle before the sort") {
    // q_txt_redact / q_sample_hash end in an orderBy for the oracle; the
    // operators themselves must add no Exchange beyond that final sort
    val redact = graft.ops.TextAnalysis.redact(col("text"))
    val p1 = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), redact.as("red"))
      .queryExecution.executedPlan.toString
    assert(!p1.contains("Exchange"), s"redact shuffled:\n$p1")
    val p2 = graft.ops.Sampling.hashSample(
        spark.read.parquet(s"$dir/documents.parquet").select("doc_id"),
        "doc_id", 2)
      .queryExecution.executedPlan.toString
    assert(!p2.contains("Exchange"), s"hashSample shuffled:\n$p2")
    // and the scan reads only doc_id for the sample
    assert("ReadSchema: struct<doc_id:bigint>".r.findFirstIn(p2).isDefined,
      s"column pruning lost:\n$p2")
  }

  test("metadata-only media stats never read the binary payload column") {
    val media = graft.multimodal.Multimodal.synthesize(spark, 10)
    val tmp = tmpDir("media-")
    media.write.parquet(s"$tmp/media")
    val p = graft.multimodal.Multimodal.mediaStats(
      spark.read.parquet(s"$tmp/media"))
      .queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
    assert(!readSchema.contains("bytes"),
      s"binary column not pruned from scan: $readSchema")
  }

  test("horizon fact build is a single shuffle, no joins") {
    import java.sql.{Date, Timestamp}
    val fx = (1 to 40).map { i =>
      (i, i % 8 + 1, (i % 5) + 1, ((i + 2) % 5) + 1, i % 20 + 1, (i + 7) % 20 + 1)
    }
    import spark.implicits._
    val dimFixture = fx.toDF("fixture_id", "gameweek_id", "team_h_difficulty",
      "team_a_difficulty", "team_h_id", "team_a_id")
      .withColumn("source_snapshot_ts", lit(Timestamp.valueOf("2025-08-12 06:00:00")))
      .withColumn("source_snapshot_date", lit(Date.valueOf("2025-08-12")))
      .withColumn("source_run_id", lit("r"))
    val fact = graft.fpl.Gold.fixtureHorizons(dimFixture, asofGw = 2,
      Date.valueOf("2025-08-12"), Timestamp.valueOf("2025-08-12 06:00:00"))
    fact.collect() // let AQE finalize
    // count only the final plan (the string repeats exchanges under the
    // "== Initial Plan ==" section)
    val p = fact.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"horizon fact should shuffle exactly once:\n$p")
    assert(!p.contains("Join"), s"horizon fact should not join:\n$p")
  }
}
