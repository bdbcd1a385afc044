package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join without a shuffle") {
    val orders = spark.range(1000).select(
      col("id").as("custkey"), (col("id") * 7 % 100).as("total"))
    val returns = spark.range(500).select(
      (col("id") * 2).as("custkey"), lit(1).as("returned"))
    Bucketed.save(orders, "b_orders", "custkey", 4)
    Bucketed.save(returns, "b_returns", "custkey", 4)

    // force the shuffle-join path so the bucketing (not a broadcast of
    // these tiny test tables) is what eliminates the exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.colocatedJoin(spark, "b_orders", "b_returns",
        "custkey")
      assert(joined.count() === 500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")

      // contrast: the same join over plain (non-bucketed) frames shuffles
      // — bucketing is what removed the exchange
      val plain = orders.join(returns, Seq("custkey"))
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange"),
        s"control join should shuffle:\n$plainPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_returns")
  }

  test("bucketed aggregation on the bucket key needs no exchange") {
    val df = spark.range(1000).select(col("id").as("k"), lit(1.0).as("v"))
    Bucketed.save(df, "b_agg", "k", 4)
    val agg = spark.table("b_agg").groupBy("k").agg(sum("v"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed agg still shuffles:\n$plan")
    spark.sql("DROP TABLE IF EXISTS b_agg")
  }
}
