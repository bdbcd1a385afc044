package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for compute-bound map stages.
  *
  * A single large parquet file with one row group scans as ONE partition —
  * a signature/hash stage downstream then runs on one core no matter how
  * many the cluster has. `spread` repartitions up to the session's default
  * parallelism only when the input has fewer partitions, so on properly
  * split cluster inputs (many files / row groups) it is a no-op and adds
  * no shuffle. */
object Partitioning {

  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
