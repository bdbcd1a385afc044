package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of (point-in-time) join — the temporal join every
  * training-data pipeline needs (join facts to the latest dimension
  * snapshot at event time) and one Spark lacks natively.
  *
  * Spark-first formulation: tag both sides, UNION them, and carry the
  * right side's payload forward with a `last(ignoreNulls)` running window
  * per key ordered by (ts, side) — right rows sort before left rows at
  * equal timestamps, giving `left.ts >= right.ts` semantics. ONE shuffle
  * on the key, state O(1) per key — no range-condition join (which Spark
  * would execute as a broadcast-nested-loop or a full sort-merge
  * inequality join with quadratic bucket blowup).
  */
object AsOf {

  /** For each left row: the latest `right` row with the same `keys` and
    * `right.tsCol <= left.tsCol`. Right payload columns come back with
    * `rightPrefix`; left rows with no matching right row are dropped
    * (inner as-of) or kept with nulls (`joinType = "left"`).
    *
    * `right` must be unique per (keys, tsCol) — pre-aggregate otherwise
    * (ties would make the carried payload order-dependent). */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                       tsCol: String, joinType: String = "inner",
                       rightPrefix: String = "asof_"): DataFrame = {
    require(Seq("inner", "left").contains(joinType),
      s"unsupported asof join type $joinType")
    val payloadCols = right.columns.filterNot(c =>
      keys.contains(c) || c == tsCol).toSeq
    val leftCols = left.columns.toSeq
    val reserved = Seq("__p", "__side", "__asof")
    require(!leftCols.exists(reserved.contains),
      s"left must not contain reserved columns ${reserved.mkString(",")}")
    val outNames = payloadCols.map(rightPrefix + _)
    require(!leftCols.exists(outNames.contains),
      s"output name collision: left already has ${
        leftCols.filter(outNames.contains).mkString(",")}")

    // SQL join semantics: NULL keys (or NULL ts) never match. Right rows
    // with null keys can't match anything; left rows with null keys match
    // nothing — dropped for inner, passed through with null payload for
    // left joins.
    def keysNotNull(df: DataFrame) =
      keys.map(col(_).isNotNull).reduce(_ && _) && col(tsCol).isNotNull
    val leftValid = left.filter(keysNotNull(left))
    val leftNullKeyed = left.filter(!keysNotNull(left))

    // one unified relation: left rows carry a null payload struct, right
    // rows carry only (keys, ts, payload)
    val payloadStruct = struct(payloadCols.map(col): _*)
    val r = right.filter(keysNotNull(right)).select(
      (keys.map(col) :+ col(tsCol) :+ payloadStruct.as("__p")): _*)
      .withColumn("__side", lit(0))
    val l = leftValid
      .withColumn("__p", lit(null).cast(r.schema("__p").dataType))
      .withColumn("__side", lit(1))
    val unioned = l.select(
      (keys.map(col) :+ col(tsCol) :+ col("__p") :+ col("__side")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol)
          .map(col): _*)
      .unionByName(r, allowMissingColumns = true)

    // carry the latest right payload forward; at equal ts the right row
    // (side 0) precedes the left row -> inclusive `>=` semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val matched =
      if (joinType == "inner") carried.filter(col("__asof").isNotNull)
      else carried
    val enriched = matched.select(
      leftCols.map(col) ++
        payloadCols.map(c =>
          col("__asof").getField(c).as(s"$rightPrefix$c")): _*)
    if (joinType == "left")
      enriched.unionByName(
        leftNullKeyed.select(leftCols.map(col) ++ payloadCols.map(c =>
          lit(null).cast(right.schema(c).dataType)
            .as(s"$rightPrefix$c")): _*))
    else enriched
  }
}
