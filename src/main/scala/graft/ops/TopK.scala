package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate top-K (heavy hitters) at scale, without a sketch UDAF.
  *
  * Two passes, both built-ins:
  *   1. CANDIDATES: deterministically sample SOURCE ROWS on a stable key
  *      (md5 of `keyCol` — [[Sampling.hashSampleCond]]; sampling must key
  *      on row identity, NOT the value: hashing the value itself keeps or
  *      drops ALL occurrences of each value together, which silently
  *      excludes every heavy hitter outside the hash range). Count the
  *      sampled rows per value and keep the top `candidateFactor * k`.
  *      A heavy hitter (f ≥ n/k occurrences spread over many rows)
  *      appears in a p-sample ~Binomial(f, p) times — concentration
  *      puts it in the candidate set with overwhelming probability.
  *   2. EXACT: count ONLY candidate values over the full data (broadcast
  *      semi-join, map-side prefilter) and keep the true top k.
  *
  * Reported counts are therefore EXACT (unlike count-min/Misra-Gries);
  * only candidate selection is approximate. Shuffle volume: pass 1
  * moves a sampleSixteenths/16 sample of (value) keys, pass 2 only rows
  * matching ~candidateFactor·k distinct values. Fully deterministic —
  * the DuckDB oracle replays both passes. */
object TopK {

  /** `sampler` picks the pass-1 row sample from the row key (default: md5
    * hash sample — portable for ANY key type). When the row identity is
    * numeric, pass [[Sampling.arithmeticSampleCond]]: one integer op per
    * row instead of a crypto digest, which is the dominant pass-1 cost on
    * wide corpora (the digest runs once per token occurrence). */
  def approxTopK(df: DataFrame, keyCol: Column, valueCol: Column, k: Int,
                 sampleSixteenths: Int = 2,
                 candidateFactor: Int = 4,
                 sampler: (Column, Int) => Column = Sampling.hashSampleCond): DataFrame = {
    require(k >= 1 && candidateFactor >= 1)
    val base = df.select(keyCol.as("__row_key"), valueCol.as("value"))
    val candidates = base
      .filter(sampler(col("__row_key"), sampleSixteenths))
      .groupBy("value").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value").asc)
      .limit(candidateFactor * k)
      .select("value")
    base.join(broadcast(candidates), Seq("value"), "left_semi")
      .groupBy("value").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value").asc)
      .limit(k)
  }
}
