package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-prefiltered semi join == plain semi join (no false negatives)") {
    val probe = spark.range(10000).select(col("id"),
      (col("id") % 997).as("k"))
    val build = spark.range(200).select((col("id") * 7).as("bk"))
    val expected = probe.join(build, probe("k") === build("bk"), "left_semi")
      .select("id").as[Long].collect().toSet
    val got = BloomJoin.semiJoin(probe, build, "k", "bk",
        expectedItems = 200)
      .select("id").as[Long].collect().toSet
    assert(got === expected)
  }

  test("bloom semi join handles NULL keys on both sides") {
    val probe = Seq(Some(1L), Some(2L), None).toDF("k")
      .withColumn("id", monotonically_increasing_id())
    val build = Seq(Some(2L), None).toDF("bk")
    val out = BloomJoin.semiJoin(probe, build, "k", "bk", expectedItems = 10)
    // NULL = NULL is not TRUE in join semantics: only k=2 survives
    assert(out.select("k").as[Option[Long]].collect().toSeq === Seq(Some(2L)))
  }

  test("bloom prefilter actually eliminates rows before the join") {
    val probe = spark.range(100000).toDF("k")
    val build = Seq(5L, 10L, 15L).toDF("bk")
    val bloom = build.select(col("bk").cast("long").as("k"))
      .stat.bloomFilter("k", 3, 0.01)
    val survivors = probe
      .filter(col("k").isin((0L until 100000L).filter(bloom.mightContainLong): _*))
    // fpp 1% over 100k rows: survivors should be ~ 3 + 1% of 100k
    assert(survivors.count() < 5000,
      "bloom filter failed to prune the probe side")
  }

  test("tfidf: weights match hand computation") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry date")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(docs)
      .select("doc_id", "term", "tf", "df", "tfidf")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // Catalyst math exprs use StrictMath (reproducible across JVMs) —
    // expectations must too, Math.log differs by 1 ulp
    assert(out((1L, "apple")) === ((2L, 1L, 2.0 * StrictMath.log(3.0 / 1.0))))
    assert(out((1L, "banana")) === ((1L, 2L, 1.0 * StrictMath.log(3.0 / 2.0))))
    assert(out((3L, "cherry")) === ((2L, 2L, 2.0 * StrictMath.log(3.0 / 2.0))))
    assert(out((3L, "date"))._3 === StrictMath.log(3.0))
    assert(out.size === 6)
  }
}
