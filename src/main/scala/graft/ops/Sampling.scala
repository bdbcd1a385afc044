package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling operators for training-data pipelines.
  *
  * Two flavors, per the standard corpus-construction playbook:
  *  - [[hashSample]]: DETERMINISTIC content-hash sampling — the same rows
  *    are selected on every run, on any engine, at any parallelism (the
  *    property train/eval splits need; Bernoulli `df.sample` draws differ
  *    per run/partitioning). Map-only predicate evaluated inside the scan
  *    stage (md5 can't push into parquet, but nothing shuffles).
  *  - [[stratifiedSample]]: per-stratum fractions via `df.stat.sampleBy`
  *    (seeded Bernoulli) — for rebalancing skewed strata where exact
  *    reproducibility across engines is not required.
  */
object Sampling {

  /** Keep rows whose key md5 falls in the first `sixteenths`/16 of hash
    * space (first hex nibble < threshold). md5 is identical everywhere, so
    * the selected set is portable across engines and runs — the DuckDB
    * oracle replays it exactly. */
  def hashSampleCond(key: Column, sixteenths: Int): Column = {
    require(sixteenths >= 1 && sixteenths <= 16, "sixteenths in [1,16]")
    val nibbles = "0123456789abcdef".take(sixteenths).map(_.toString)
    substring(md5(key.cast("string")), 1, 1).isin(nibbles: _*)
  }

  def hashSample(df: DataFrame, keyCol: String, sixteenths: Int): DataFrame =
    df.filter(hashSampleCond(col(keyCol), sixteenths))

  /** Deterministic train/validation/test split by key hash: returns the
    * split label column ("train"/"val"/"test") from the md5 of the key —
    * stable under reruns, resharding, and engine changes. Fractions are in
    * 16ths (e.g. (12, 2, 2) → 75/12.5/12.5). */
  def splitLabel(key: Column, trainSixteenths: Int = 12,
                 valSixteenths: Int = 2): Column = {
    require(trainSixteenths + valSixteenths < 16, "leave room for test")
    val nib = substring(md5(key.cast("string")), 1, 1)
    val order = "0123456789abcdef"
    val trainSet = order.take(trainSixteenths).map(_.toString)
    val valSet = order.slice(trainSixteenths, trainSixteenths + valSixteenths)
      .map(_.toString)
    when(nib.isin(trainSet: _*), "train")
      .when(nib.isin(valSet: _*), "val")
      .otherwise("test")
  }

  /** Per-stratum seeded Bernoulli sampling (`sampleBy`). */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       fractions: Map[Any, Double],
                       seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)
}
