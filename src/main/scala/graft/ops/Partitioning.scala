package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

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
  * and AQE is not bypassed. Plans whose leaves are not file scans (an
  * upstream shuffle exists, or an in-memory relation) are left alone:
  * their parallelism is already governed by `spark.sql.shuffle.partitions`
  * or the source's own splitting. */
object Partitioning {

  def spread(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    // typed accessor handles unit-suffixed settings ("128m", "1g")
    val maxBytes = math.max(1L, spark.sessionState.conf.filesMaxPartitionBytes)
    val scans = df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    if (scans.isEmpty) df // shuffled / non-file input: already parallel
    else {
      val estPartitions = scans.map { f =>
        math.max(1L, (f.relation.location.sizeInBytes + maxBytes - 1) / maxBytes)
      }.sum
      if (estPartitions < target) df.repartition(target) else df
    }
  }
}
