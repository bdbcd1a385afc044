package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join without an equi key — the join shape Spark's
  * optimizer turns into BroadcastNestedLoop/cartesian when written
  * naively as `ON p.ts BETWEEN i.start AND i.end`.
  *
  * Grid-bucketing rewrite (the standard interval-join plan in Flink's
  * and DuckDB/Postgres range-join literature): time is cut into fixed
  * cells; every point lands in exactly ONE cell, every interval explodes
  * to the cells it overlaps, and the range match becomes a cell
  * EQUI-join + exact BETWEEN refine. Shuffle partitions on the cell id —
  * no cross product at any scale, and the plan is a plain
  * shuffle-hash/sort-merge join Catalyst knows how to optimize.
  *
  * Each point matches a given interval in exactly one cell (the point's
  * own), so no pair-dedup is needed. Explosion factor per interval is
  * `length/cellWidth + 1`: pick `cellWidthMs` near the typical interval
  * length (explosion ~2×); degenerate very-long intervals are the skew
  * knob — split them upstream or widen the grid. */
object RangeJoin {

  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      cellWidthMs: Long): DataFrame = {
    require(cellWidthMs > 0, "cellWidthMs must be positive")
    require(!points.columns.contains("__cell") &&
      !intervals.columns.contains("__cell"),
      "inputs must not carry a __cell column (reserved working column)")
    val pc = points.withColumn("__cell",
      floor(unix_millis(col(ptCol)) / cellWidthMs))
    val ic = intervals.withColumn("__cell",
      explode(sequence(floor(unix_millis(col(startCol)) / cellWidthMs),
        floor(unix_millis(col(endCol)) / cellWidthMs))))
    pc.join(ic, "__cell")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("__cell")
  }
}
