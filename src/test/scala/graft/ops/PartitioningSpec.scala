package graft.ops

import graft.SparkSpec

class PartitioningSpec extends SparkSpec {

  private def oneFileTable(): String = {
    val p = tmpDir("spread-") + "/t"
    spark.range(1000).coalesce(1).write.parquet(p)
    p
  }

  test("spread widens a single-file scan to default parallelism") {
    val df = spark.read.parquet(oneFileTable())
    val out = Partitioning.spread(df)
    assert(out.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
  }

  test("spread unwraps AQE (subquery, no exchange) and still widens") {
    spark.read.parquet(oneFileTable()).createOrReplaceTempView("spread_t")
    // the scalar subquery makes AQE wrap the plan: AdaptiveSparkPlanExec
    // is a leaf from the outside, so an un-unwrapped collect would find
    // no scans and silently skip the widening this single-file scan needs
    val q = spark.sql(
      "SELECT * FROM spread_t WHERE id >= (SELECT min(id) FROM spread_t)")
    val out = Partitioning.spread(q)
    assert(out.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
  }

  test("spread is a no-op when a shuffle already governs parallelism") {
    val df = spark.read.parquet(oneFileTable()).groupBy("id").count()
    assert(Partitioning.spread(df) eq df)
  }
}
