package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beyond [[Components]].
  *
  * PageRank here is FIXED-POINT (scaled-integer) power iteration: ranks
  * are bigints scaled by 1e12 and every step uses only integer add /
  * multiply / truncating division. Floating-point PageRank is not
  * bit-reproducible across engines (double summation order differs), but
  * integer arithmetic is exact and associative — the same iteration count
  * yields the SAME bits on Spark, DuckDB, or anything else, which makes
  * the operator oracle-checkable and its pipelines rerun-stable. The cost
  * is bounded truncation error (< outdeg ulps of 1e-12 per vertex per
  * step) — irrelevant for ranking use.
  *
  * Scale shape per iteration: one join of edges to current ranks on src
  * (both hash-partitioned; AQE broadcasts small rank tables) + one
  * groupBy(dst) sum — the canonical Pregel-as-joins formulation. Lineage
  * is cut per iteration with localCheckpoint, like [[Components]].
  * Dangling vertices (no out-edges) simply leak their mass, the common
  * simplified variant. */
object Graphs {

  val Scale = 1000000000000L // 1e12 default fixed-point scale

  /** (id, rank_fp) after `iters` power iterations with damping 0.85;
    * rank_fp is the `scale`-scaled integer rank.
    *
    * Pick `scale` so total rank mass stays clear of long overflow under
    * ANSI arithmetic: 85 * V * scale must fit in 63 bits (V = vertex
    * count) — the 1e12 default covers V up to ~10^5; at 10^9 vertices use
    * scale = 1e6 (micro-rank precision, still exact and portable). */
  def pageRankFixedPoint(edges: DataFrame, iters: Int = 3,
                         srcCol: String = "src",
                         dstCol: String = "dst",
                         scale: Long = Scale): DataFrame = {
    require(iters >= 1, "at least one iteration")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
      .localCheckpoint() // edges re-join every round: materialize once
    val vertices = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val base = lit((15L * scale) / 100L)
    var ranks = vertices.withColumn("rank_fp", lit(scale))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
        .join(outDeg, Seq("src"))
        .select(col("dst").as("id"),
          expr("rank_fp div deg").as("c")) // truncating div: exact, portable
        .groupBy("id").agg(sum("c").as("contrib"))
      ranks = vertices
        .join(contribs, Seq("id"), "left")
        .select(col("id"),
          (base + expr("85 * coalesce(contrib, 0L) div 100")).as("rank_fp"))
        .localCheckpoint()
    }
    ranks
  }
}
