package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("grid range join equals the naive cross+filter; no cartesian in plan") {
    val points = (0L until 200L).map(i => (i, ts(i * 37)))
      .toDF("pid", "pt")
    val intervals = (0L until 20L).map(i => (i, ts(i * 300), ts(i * 300 + 450)))
      .toDF("iid", "start_ts", "end_ts")
    val grid = RangeJoin.pointInInterval(points, "pt",
      intervals, "start_ts", "end_ts", cellWidthMs = 120000)
    val naive = points.crossJoin(intervals)
      .filter(col("pt") >= col("start_ts") && col("pt") <= col("end_ts"))
    assert(grid.select("pid", "iid").as[(Long, Long)].collect().toSet ===
      naive.select("pid", "iid").as[(Long, Long)].collect().toSet)
    assert(grid.count() > 0)
    // and each (point, interval) match appears exactly once
    assert(grid.count() === grid.select("pid", "iid").distinct().count())
    val plan = grid.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("NestedLoop"),
      s"range join degraded to a cross product:\n$plan")
  }

  test("boundary semantics are inclusive on both ends") {
    val points = Seq((1L, ts(100)), (2L, ts(200)), (3L, ts(201)))
      .toDF("pid", "pt")
    val intervals = Seq((1L, ts(100), ts(200))).toDF("iid", "s", "e")
    val out = RangeJoin.pointInInterval(points, "pt", intervals, "s", "e",
        cellWidthMs = 50000)
      .select("pid").as[Long].collect().toSet
    assert(out === Set(1L, 2L))
  }
}
