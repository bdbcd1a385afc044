package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows, 90% on key 1 (heavy hitter), rest spread over 100 keys
  private lazy val skewed = spark.range(10000).select(
    when(col("id") % 10 =!= 0, 1L).otherwise(col("id") % 100).as("k"),
    lit(1.0).as("v"))

  test("saltedSumCount equals the direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n_rows"))
      .as[(Long, Double, Long)].collect().toSet
    val salted = Skew.saltedSumCount(skewed, Seq("k"), "v")
      .as[(Long, Double, Long)].collect().toSet
    assert(salted === direct)
  }

  test("salted phase 1 spreads the hot key over multiple reducers") {
    val salted = skewed.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(16)))
    val spread = salted.filter($"k" === 1L).select("__salt")
      .distinct().count()
    assert(spread > 4, s"hot key only reached $spread salt buckets")
  }

  test("saltedJoinSmall equals the plain join") {
    val dim = Seq((1L, "hot"), (10L, "a"), (20L, "b")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k"))
      .groupBy("name").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSet
    val salted = Skew.saltedJoinSmall(skewed, dim, "k")
      .groupBy("name").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSet
    assert(salted === plain)
  }

  test("heavyHitters surfaces the skewed key") {
    val hh = Skew.heavyHitters(skewed, Seq("k"), threshold = 0.5)
      .select("k").as[Long].collect()
    assert(hh.toSeq === Seq(1L))
  }
}
