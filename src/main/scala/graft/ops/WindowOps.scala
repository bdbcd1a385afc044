package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic-window operators declared by the reference's backlog:
  * price-delta lags (docs/backlog.md:46 — "price deltas" over
  * `gold.fact_price_snapshot`, resources/uc/objects.sql:215-224) and
  * rolling live-form features (A6: `gold.fact_live_form`,
  * resources/uc/objects.sql:238-247, docs/backlog.md:79-81).
  *
  * Scale: each is exactly one shuffle on the partition key; frames are
  * bounded (no unbounded-following), so state per key is O(frame).
  */
object WindowOps {

  /** Per-entity deltas of `valueCol` between consecutive snapshots:
    * lag + difference. `tieBreaker` makes ordering total → deterministic. */
  def snapshotDeltas(df: DataFrame, partitionKey: String, orderCol: String,
                     valueCol: String, tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(partitionKey)
      .orderBy(col(orderCol).asc, col(tieBreaker).asc)
    df.select(
      col(partitionKey), col(orderCol), col(tieBreaker), col(valueCol),
      lag(col(valueCol), 1).over(w).as("prev_value"),
      (col(valueCol) - lag(col(valueCol), 1).over(w)).as("delta"))
  }

  /** Rolling mean over the last `n` rows per key (live-form style
    * feature: form_score = rolling mean of recent per-event points). */
  def rollingMean(df: DataFrame, partitionKey: String, orderCol: String,
                  valueCol: String, n: Int, tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(partitionKey)
      .orderBy(col(orderCol).asc, col(tieBreaker).asc)
      .rowsBetween(-(n - 1), Window.currentRow)
    df.select(
      col(partitionKey), col(orderCol), col(tieBreaker), col(valueCol),
      avg(col(valueCol)).over(w).as(s"rolling_mean_$n"),
      count(lit(1)).over(w).as("window_rows"))
  }
}
