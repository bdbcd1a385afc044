package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for heavy-hitter keys (SURVEY.md §7 scale
  * notes; the standard salting playbook for 100 TB shuffles where one key
  * holds a disproportionate share of rows).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * cover the aggregation side and the explicit two-phase pattern for when
  * a deterministic plan is preferred over runtime re-planning.
  */
object Skew {

  /** Two-phase salted aggregation: sums/counts grouped by (key, salt)
    * first — spreading a hot key over `saltBuckets` reducers — then
    * re-aggregated by key. Correct for any algebraic aggregate expressed
    * as (partial, merge) pairs; exposed for the common count/sum case.
    *
    * Shuffle shape: phase 1 partitions by (key, salt) — hot keys spread
    * evenly; phase 2 moves only `saltBuckets` rows per key. */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)).cast("int"))
    val phase1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    phase1.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n_rows"))
  }

  /** Salted broadcast-side join for a skewed fact ⋈ small dim: replicate
    * the dim `saltBuckets` times (one per salt), salt the fact rows, join
    * on (key, salt). Spreads a hot fact key across reducers while keeping
    * exact join semantics. Only sensible when the dim side is broadcast-
    * small (it is replicated). */
  def saltedJoinSmall(fact: DataFrame, dim: DataFrame, key: String,
                      saltBuckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedFact.join(broadcast(replicatedDim), Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Heavy-hitter report: keys holding more than `threshold` of all rows
    * (the diagnostic used to decide whether salting is needed).
    *
    * Single-job shape: the grand total is the sum of the per-key counts,
    * broadcast-joined back onto them — both arms share the same groupBy
    * exchange, which Spark's exchange reuse executes ONCE (no separate
    * count() scan of the input). */
  def heavyHitters(df: DataFrame, keyCols: Seq[String],
                   threshold: Double = 0.01): DataFrame = {
    val grouped = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    val total = grouped.agg(sum("n").as("__total"))
    grouped.join(broadcast(total))
      .withColumn("share", col("n") / col("__total").cast("double"))
      .drop("__total")
      .filter(col("share") >= threshold)
      .orderBy(col("n").desc)
  }
}
