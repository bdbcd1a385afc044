package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {
  import spark.implicits._

  test("a hot bucket's staged split fans out across >1 task: the " +
       "REBALANCE's skew splitting cuts the oversized cell at map-block " +
       "boundaries (SCALE.md skewed_merge's mechanism, pinned)") {
    // SCALE_BENCH's skewed_merge family shows the hot-bucket batch
    // merging FASTER than uniform; the mechanism is AQE splitting the
    // staged split's oversized rebalance partition (the plan shows
    // `AQEShuffleRead skewed`). That is CONFIG-SENSITIVE behavior
    // (optimizeSkewsInRebalancePartitions + advisory size) — this spec
    // pins the fan-out itself, so a config/AQE drift can't silently
    // serialize the 100 TB skew case while the sf0.1 wall stays
    // unremarkable. Two measured facts shape the setup:
    //  - skew splitting cuts at upstream MAP-BLOCK boundaries only: a
    //    single-map upstream (anything behind a limit(), or a tiny
    //    AQE-coalesced join) can never fan out however large — so the
    //    hot batch is an explicit 8-partition range with no limit, the
    //    way a 100 TB batch arrives as thousands of map tasks;
    //  - the batch targets an UNTOUCHED cell, taking merge's
    //    insert-only fast path, where the staged split's files are
    //    adopted verbatim as the committed file-set — the part-file
    //    count IS the split's task count. (The COW-join rewrite runs
    //    the same stageCellSplit; at test sizes its upstream join
    //    coalesces to one map, which only re-proves the map-boundary
    //    rule above.)
    val advisoryKey = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val prev = spark.conf.get(advisoryKey)
    spark.conf.set(advisoryKey, "65536") // a test-sized cell crosses it
    try {
      val t = VersionedTable(spark, tmpDir("graft-hotfan-"))
      // seed AVOIDS bucket 0, so the hot batch's cell has no existing
      // rows (insert-only fast path adopts the staged split verbatim)
      t.merge(spark.range(256)
        .filter(pmod(hash(col("id")), lit(8)) =!= 0)
        .select(col("id").as("k"), lit("seed").as("pad")),
        Seq("k"), numBuckets = 8)
      assert(!t.history.last.fileSets.exists(_.endsWith(".b00000")))
      // every key hashes to bucket 0 — the engine's own split
      // expression (pmod over hash) — with an incompressible payload
      // so the staged cell is many advisory units wide
      val hot = spark.range(0L, 240000L, 1L, 8)
        .filter(pmod(hash(col("id")), lit(8)) === 0)
        .select(col("id").as("k"), sha2(col("id").cast("string"), 256).as("pad"))
      t.merge(hot, Seq("k"), numBuckets = 8)
      // the committed hot-cell file-set holds one part file PER TASK
      // that wrote it — >1 means the skew split actually fanned out
      val hotSets = t.history.last.fileSets.filter(_.endsWith(".b00000"))
      assert(hotSets.size === 1, s"expected one hot cell, got $hotSets")
      val parts = java.nio.file.Files.list(
        java.nio.file.Paths.get(t.root, "data", hotSets.head))
      val nParts =
        try parts.filter(p => p.getFileName.toString.startsWith("part-"))
          .count()
        finally parts.close()
      assert(nParts > 1,
        s"hot bucket serialized into $nParts task(s) — AQE rebalance " +
          "skew splitting is not engaging")
      // and the data is intact: every hot key landed exactly once
      val nHot = t.read.filter(col("pad") =!= "seed").count()
      assert(nHot > 20000L && nHot ===
        t.read.filter(col("pad") =!= "seed").select("k").distinct().count())
    } finally spark.conf.set(advisoryKey, prev)
  }

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
