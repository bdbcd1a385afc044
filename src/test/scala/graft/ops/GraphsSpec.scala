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
}
