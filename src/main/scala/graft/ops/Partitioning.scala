package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Input-parallelism guard for compute-bound map stages.
  *
  * A single large parquet file with one row group scans as ONE partition —
  * a signature/hash stage downstream then runs on one core no matter how
  * many the cluster has. `spread` repartitions up to the session's default
  * parallelism only when the input would scan with fewer partitions, so on
  * properly split cluster inputs (many files / row groups) it is a no-op
  * and adds no shuffle.
  *
  * The partition estimate is plan-level (scan byte size ÷
  * `spark.sql.files.maxPartitionBytes`) — no RDD lineage is materialized
  * and AQE is not bypassed. Plans containing a shuffle are left alone:
  * their parallelism is already governed by `spark.sql.shuffle.partitions`.
  * AQE-wrapped plans (any exchange or subquery present) are unwrapped
  * through `AdaptiveSparkPlanExec` before inspection — the wrapper is a
  * leaf from the outside, so a naive collect would find no scans and
  * silently skip the subquery-but-no-exchange case where a single-file
  * scan genuinely needs widening. */
object Partitioning {

  /** Every node of `p`, descending through AQE wrappers (which present as
    * leaves to the outer plan's own `collect`). */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    // executedPlan (not inputPlan): exchanges are only inserted by the
    // preparation rules, so inputPlan would under-report shuffles
    case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
    case _                        => p.children.flatMap(nodes)
  })

  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // typed accessor handles unit-suffixed settings ("128m", "1g")
    val maxBytes = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
    val all = nodes(df.queryExecution.executedPlan)
    val scans = all.collect { case f: FileSourceScanExec => f }
    // a shuffle anywhere means output parallelism is the shuffle's, not
    // the scan's — widening after it would just add a useless exchange
    if (scans.isEmpty || all.exists(_.isInstanceOf[ShuffleExchangeLike])) df
    else {
      val estPartitions = scans.map { f =>
        math.max(1L, (f.relation.location.sizeInBytes + maxBytes - 1) / maxBytes)
      }.sum
      if (estPartitions < target) df.repartition(target) else df
    }
  }
}
