package graft.tables

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed managed tables: pre-shuffled layout for co-located joins.
  *
  * The scale story: two fact tables bucketed by the same key and bucket
  * count join WITHOUT a shuffle — Spark's scan reports the bucketing as
  * `HashPartitioning`, so the join's distribution requirement is already
  * met. At 100 TB this turns every repeated fact⋈fact join on the bucket
  * key from the dominant shuffle into a local merge. The trade: one
  * upfront shuffle at write time, amortized over every later join
  * (SURVEY.md §7 "co-locate joins via bucketing").
  */
object Bucketed {

  /** Save `df` as a managed bucketed (and optionally sorted) table. */
  def save(df: DataFrame, table: String, bucketCol: String, numBuckets: Int,
           sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w)
      .format("parquet") // managed: lives under spark.sql.warehouse.dir
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on the bucket key — shuffle-free when
    * bucket specs match. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
