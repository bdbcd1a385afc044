package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: per-key date spine + gap filling.
  *
  * Sparse per-entity observations (price snapshots, daily aggregates with
  * holes) become a dense regular series: one row per (key, day) between
  * the key's first and last observation, missing values filled by LOCF
  * (last observation carried forward) — the standard feature-store
  * preparation step before windowed features or model scoring.
  *
  * Scale shape: the spine is GENERATED map-side from each key's (min,
  * max) — one small agg, then `sequence()` + `explode` inside the task,
  * no driver-side date loop and no cross join against a calendar table.
  * The fill is one window per key (single shuffle on the key, which the
  * subsequent join shares under AQE). */
object TimeSeries {

  /** Dense daily spine per key over [min(dateCol), max(dateCol)] with
    * `valueCols` LOCF-filled into `<col>_filled`. `dateCol` must be a
    * date column; original sparse values are kept alongside. */
  def gapFillDaily(df: DataFrame, keyCol: String, dateCol: String,
                   valueCols: Seq[String]): DataFrame = {
    val spine = df.groupBy(keyCol)
      .agg(min(col(dateCol)).as("__mn"), max(col(dateCol)).as("__mx"))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"),
          expr("interval 1 day"))).as(dateCol))
    val w = Window.partitionBy(keyCol).orderBy(dateCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = spine.join(df, Seq(keyCol, dateCol), "left")
    valueCols.foldLeft(joined) { (d, v) =>
      d.withColumn(s"${v}_filled", last(col(v), ignoreNulls = true).over(w))
    }
  }
}
