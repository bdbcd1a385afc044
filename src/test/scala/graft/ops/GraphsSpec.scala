package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("fixed-point PageRank matches hand computation (one iteration)") {
    // 1→2, 1→3, 2→3, 3→1; outdeg: 1:2, 2:1, 3:1; scale 1000, base 150
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val out = Graphs.pageRankFixedPoint(edges, iters = 1, scale = 1000L)
      .as[(Long, Long)].collect().toMap
    // contribs: ->1: 1000; ->2: 1000 div 2 = 500; ->3: 500 + 1000 = 1500
    assert(out === Map(
      1L -> (150L + 85L * 1000L / 100L),  // 1000
      2L -> (150L + 85L * 500L / 100L),   // 575
      3L -> (150L + 85L * 1500L / 100L))) // 1425
  }

  test("fixed-point PageRank is bit-identical across reruns") {
    val rnd = new scala.util.Random(9)
    val edges = Seq.fill(2000)((rnd.nextInt(200).toLong,
      rnd.nextInt(200).toLong)).toDF("src", "dst")
    val a = Graphs.pageRankFixedPoint(edges, iters = 3)
      .as[(Long, Long)].collect().toSet
    val b = Graphs.pageRankFixedPoint(edges.repartition(7), iters = 3)
      .as[(Long, Long)].collect().toSet
    assert(a === b, "rank bits changed under different partitioning")
  }

  test("gapFillDaily: dense spine per key, LOCF fill") {
    val d = java.sql.Date.valueOf(_: String)
    val df = Seq(
      ("a", d("2024-01-01"), Some(1.0)),
      ("a", d("2024-01-04"), Some(4.0)),
      ("b", d("2024-02-10"), Some(7.0))).toDF("k", "day", "v")
    val out = TimeSeries.gapFillDaily(df, "k", "day", Seq("v"))
      .select("k", "day", "v_filled")
      .as[(String, java.sql.Date, Double)].collect()
      .map(r => (r._1, r._2.toString) -> r._3).toMap
    assert(out.size === 5) // a: 4 days, b: 1 day
    assert(out(("a", "2024-01-01")) === 1.0)
    assert(out(("a", "2024-01-02")) === 1.0) // carried forward
    assert(out(("a", "2024-01-03")) === 1.0)
    assert(out(("a", "2024-01-04")) === 4.0)
    assert(out(("b", "2024-02-10")) === 7.0)
  }
}
