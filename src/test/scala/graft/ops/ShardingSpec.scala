package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic shuffle-shard ([[Sharding]]): engine-portable order,
  * contiguous balanced shards, partitioned-window plan. */
class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    spark.range(n).select(concat(lit("doc"), col("id")).as("doc_id"))

  test("assignShards reproduces the naive (md5, id) order exactly") {
    val docs = corpus(500)
    val out = Sharding.assignShards(docs, "doc_id", "s1", numShards = 7,
      numBuckets = 8)
      .select("doc_id", "shuffle_key", "shard", "shard_pos")
      .as[(String, String, Int, Long)].collect()
    // naive truth: sort by (md5 key, id), slice into contiguous ranges
    val sorted = out.map(r => (r._2, r._1)).sorted
    val t = sorted.length.toLong
    val expected = sorted.zipWithIndex.map { case ((_, id), r) =>
      val shard = r * 7 / t
      val start = (shard * t + 6) / 7
      id -> ((shard.toInt, r - start))
    }.toMap
    assert(out.map(r => r._1 -> ((r._3, r._4))).toMap === expected)
  }

  test("shards are balanced within one doc and positions are contiguous") {
    val out = Sharding.assignShards(corpus(1003), "doc_id", "s2",
      numShards = 10, numBuckets = 8)
    val sizes = out.groupBy("shard").agg(count(lit(1)).as("n"),
      min("shard_pos").as("mn"), max("shard_pos").as("mx"))
      .as[(Int, Long, Long, Long)].collect()
    assert(sizes.length === 10)
    assert(sizes.map(_._2).max - sizes.map(_._2).min <= 1)
    sizes.foreach { case (_, n, mn, mx) =>
      assert(mn === 0L && mx === n - 1)
    }
  }

  test("assignment is invariant under input repartitioning") {
    val docs = corpus(400)
    def assign(d: org.apache.spark.sql.DataFrame) =
      Sharding.assignShards(d, "doc_id", "s3", numShards = 5, numBuckets = 8)
        .select("doc_id", "shard", "shard_pos")
        .as[(String, Int, Long)].collect().toSet
    assert(assign(docs) === assign(docs.repartition(13)))
  }

  test("rank uses PARTITIONED windows, never a global-sort window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val out = Sharding.assignShards(corpus(5000), "doc_id", "s4",
      numShards = 4, numBuckets = 8)
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: LWindow => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      s"global-sort window found: $windows")
  }

  test("writeShards lands hive shard dirs whose contents match the " +
    "assignment in shuffled order") {
    val docs = corpus(200)
    val path = tmpDir("graft-shards-") + "/out"
    Sharding.writeShards(docs, "doc_id", "s5", numShards = 4, path,
      numBuckets = 8)
    val back = spark.read.parquet(path)
    val assigned = Sharding.assignShards(docs, "doc_id", "s5", 4,
      numBuckets = 8).select("doc_id", "shard", "shard_pos")
      .as[(String, Int, Long)].collect().toSet
    assert(back.select("doc_id", "shard", "shard_pos")
      .as[(String, Int, Long)].collect().toSet === assigned)
    assert(back.select("shard").distinct.as[Int].collect().sorted.toSeq ===
      Seq(0, 1, 2, 3))
  }
}
