package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-oriented row selection operators.
  *
  * Covers the reference's latest-snapshot pick (W1:
  * notebooks/03_silver/31_build_silver_dims.py:16-27 — `orderBy(desc
  * (snapshot_ts)).limit(1)`) and keyed dedup (W4: `dropDuplicates`,
  * 31_build_silver_dims.py:272, 42_build_fixture_horizons.py:90-92), but
  * made DETERMINISTIC: the reference keeps an arbitrary duplicate; we keep
  * a well-defined winner (documented divergence, SURVEY.md §7 "hard parts").
  */
object Keyed {

  /** Keep the single row per key with the greatest `orderCol`
    * (ties broken by the remaining `tieBreakers`, ascending).
    * Scale: one shuffle on `keys`; window + filter stays in whole-stage
    * codegen and never collects to the driver — unlike the reference's
    * `.limit(1).collect()` re-lift, this stays distributed.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderCol: String,
                   tieBreakers: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc +: tieBreakers.map(col(_).asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Deterministic dropDuplicates: keep the row with the smallest
    * `orderCol` per key. */
  def firstPerKey(df: DataFrame, keys: Seq[String], orderCol: String,
                  tieBreakers: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).asc +: tieBreakers.map(col(_).asc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The FINAL change per key of a change-feed slice: latest by commit
    * version, with a version's `delete` ranked BELOW its
    * insert/update_postimage. One commit can emit BOTH for one key — a
    * replace_where deletes every replaced row and inserts its
    * replacement in the SAME commit, whose post-state has the key
    * present — so ordering by version alone leaves the pick to
    * row_number's arbitrary tie-break and a consumer (replica sink,
    * ANN sync, curation admit) would nondeterministically treat a
    * replaced key as deleted. Pre-image rows must be filtered out by
    * the caller (they describe the OLD state, not a final one). */
  def latestChangePerKey(df: DataFrame, keys: Seq[String],
                         versionCol: String, typeCol: String): DataFrame =
    latestPerKey(
      df.withColumn("__graft_chord", col(versionCol) * 2 +
        when(col(typeCol) === "delete", 0).otherwise(1)),
      keys, "__graft_chord").drop("__graft_chord")

  /** The reference's duplicate-payload write guard (S7,
    * 11_ingest_fpl_bootstrap.py:138-151) generalized: rows of `incoming`
    * whose key is absent from `existing`. Left-anti join — one shuffle,
    * broadcast when `existing` is small. */
  def notIn(incoming: DataFrame, existing: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(col): _*).dropDuplicates(keys),
      keys, "left_anti")
}
