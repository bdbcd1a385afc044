package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("chunkWithOverlap: window math, stop rule, and a shuffle-free plan") {
    import graft.ops.Packing
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                    // shorter than chunk
      (3L, "   "),                                    // whitespace-only
      (4L, (1 to 13).map(i => s"w$i").mkString(" "))  // 13 tokens
    ).toDF("doc_id", "text")
    // chunk=8, overlap=4 → step=4; starts: 0 always, then s < n-4
    val out = Packing.chunkWithOverlap(docs, "text", 8, 4)
      .select("doc_id", "chunk_ix", "chunk_text", "chunk_tokens")
      .as[(Long, Int, String, Int)].collect().sortBy(r => (r._1, r._2))
    assert(out.map(r => (r._1, r._2, r._4)).toSeq === Seq(
      (1L, 0, 8), (1L, 1, 6),             // n=10: starts 0,4 (8 >= 6 stops)
      (2L, 0, 2),                          // single short chunk
      (4L, 0, 8), (4L, 1, 8), (4L, 2, 5))) // n=13: starts 0,4,8 (8 < 9)
    assert(out.head._3 === (1 to 8).map(i => s"t$i").mkString(" "))
    assert(out(1)._3 === (5 to 10).map(i => s"t$i").mkString(" "))
    // overlap: chunk 1 starts at token 5 — the last 4 of chunk 0 repeat
    // map-only: the whole chunking plan carries no Exchange
    val p = Packing.chunkWithOverlap(docs, "text", 8, 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunking shuffled:\n$p")
    assertThrows[IllegalArgumentException](
      Packing.chunkWithOverlap(docs, "text", 8, 8))
  }

  test("withRunningTotal == single-partition window cumsum, exactly") {
    val rnd = new scala.util.Random(5)
    val df = (0 until 5000).map(i => (i.toLong, rnd.nextInt(100).toLong))
      .toDF("ord", "v")
    val expected = df
      .withColumn("rt", sum("v").over(
        org.apache.spark.sql.expressions.Window.orderBy("ord")
          .rowsBetween(Long.MinValue, 0)))
      .select("ord", "rt").as[(Long, Long)].collect().toMap
    val got = Packing.withRunningTotal(df, "ord", "v", "rt", numBuckets = 8)
      .select("ord", "rt").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("withRunningTotal uses a PARTITIONED window, not a global sort") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = spark.range(10000).select(col("id").as("ord"), lit(1L).as("v"))
    val out = Packing.withRunningTotal(df, "ord", "v", numBuckets = 8)
    // every window in the plan partitions on the range bucket — a global
    // orderBy window (empty partitionSpec) would collapse to ONE task at
    // any scale (AQE may still coalesce tiny test shuffles; that's fine)
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: LWindow => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      s"global-sort window found: $windows")
    assert(out.agg(max("running_total")).as[Long].head() === 10000L)
  }

  test("packChunks: spans tile the stream; straddlers split across chunks") {
    val docs = Seq((1L, 300L), (2L, 500L), (3L, 300L), (4L, 1L))
      .toDF("doc_id", "tokens")
    val out = Packing.packChunks(docs, "doc_id", "tokens", budget = 512)
      .select("doc_id", "start_offset", "first_chunk", "last_chunk", "n_chunks")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(out(1L) === ((0L, 0L, 0L, 1L)))      // [0, 300)
    assert(out(2L) === ((300L, 0L, 1L, 2L)))    // [300, 800) straddles 512
    assert(out(3L) === ((800L, 1L, 2L, 2L)))    // [800, 1100) straddles 1024
    assert(out(4L) === ((1100L, 2L, 2L, 1L)))   // [1100, 1101)
  }
}
