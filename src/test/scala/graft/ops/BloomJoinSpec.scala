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

  test("bloom probe and zorder key COMPILE under codegen (no silent fallback)") {
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      // bloom probe over a codegen'd range source
      val probe = spark.range(5000).select(col("id"), (col("id") % 97).as("k"))
      val build = spark.range(50).select((col("id") * 2).as("bk"))
      assert(BloomJoin.semiJoin(probe, build, "k", "bk",
        expectedItems = 50).count() > 0)
      // zorder key through the public compact path
      val t = graft.tables.VersionedTable(spark, tmpDir("vt-zcg-") + "/t")
      t.append(spark.range(1000).select(col("id"),
        (col("id") * 37 % 1000).as("x")), statsFor = Seq("id", "x"))
      t.compactZOrder(Seq("id", "x"), numFileSets = 4)
      assert(t.read.count() === 1000)
    } finally spark.conf.set(key, prev)
  }

  test("bloom predicate sits BELOW the join on the probe side (plan pin)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val probe = spark.range(100000).toDF("k")
    val build = Seq(5L, 10L, 15L).toDF("bk")
    val out = BloomJoin.semiJoin(probe, build, "k", "bk", expectedItems = 3)
    val joins = out.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.size === 1)
    // the graft_bloom_contains filter must survive optimization INSIDE
    // the probe (left) subtree — that's the map-side shuffle elimination
    val bloomFiltersBelowJoin = joins.head.left.collect {
      case f: Filter if f.condition.toString.contains("graftbloomcontains")
        || f.condition.toString.contains("graft_bloom_contains") => f
    }
    assert(bloomFiltersBelowJoin.nonEmpty,
      s"bloom predicate not below the join:\n${out.queryExecution.optimizedPlan}")
    assert(out.count() === 3)
  }
}
