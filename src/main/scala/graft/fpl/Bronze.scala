package graft.fpl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Keyed

/** Bronze layer: permissive envelope construction + idempotent append.
  *
  * The reference fetches FPL REST payloads driver-side, canonicalizes the
  * JSON, hashes it, and appends one envelope row per snapshot
  * (notebooks/01_bronze/11_ingest_fpl_bootstrap.py:42-151). HTTP is out of
  * scope for the engine; we take payload strings (pre-landed files or test
  * literals) and do everything else in-engine — hashing with `sha2` and
  * `octet_length` run distributed instead of in driver Python.
  */
object Bronze {

  /** Wrap raw payload strings in the bronze envelope. Input: one row per
    * payload with (payload_json, source_url, http_status, snapshot_ts).
    * Hash/size are computed in-engine (reference computes them driver-side,
    * 11_ingest_fpl_bootstrap.py:68-72). */
  def envelope(payloads: DataFrame, runId: String): DataFrame =
    payloads.select(
      col("snapshot_ts").cast("timestamp").as("snapshot_ts"),
      current_timestamp().as("ingest_ts"),
      to_date(col("snapshot_ts")).as("snapshot_date"),
      lit(runId).as("run_id"),
      col("source_url"),
      col("http_status").cast("int").as("http_status"),
      octet_length(col("payload_json")).cast("bigint").as("payload_size_bytes"),
      sha2(col("payload_json"), 256).as("payload_sha256"),
      col("payload_json"),
    )

  /** Duplicate-payload write guard (S7/J4): drop incoming envelopes whose
    * (snapshot_date, payload_sha256) already exist in the bronze table.
    * The reference probes with `SELECT 1 ... LIMIT 1` per payload
    * (11_ingest_fpl_bootstrap.py:138-151) — a driver round-trip per row;
    * the left-anti join does all payloads in one distributed pass. */
  def dedupAgainst(incoming: DataFrame, existing: DataFrame): DataFrame =
    Keyed.notIn(incoming, existing, Seq("snapshot_date", "payload_sha256"))

  /** Latest successful snapshot row, as a 1-row DataFrame.
    *
    * Reference: `where(http_status==200).orderBy(desc(snapshot_ts))
    * .limit(1).collect()` then re-lift via createDataFrame
    * (31_build_silver_dims.py:16-27) — the heavy JSON parse then runs on a
    * driver-shipped 1-row frame. We keep it a DataFrame: TakeOrderedAndProject
    * moves exactly one row, and the downstream parse stays in the same plan. */
  def latestOk(bronze: DataFrame): DataFrame =
    bronze.where(col("http_status") === 200)
      .orderBy(col("snapshot_ts").desc)
      .limit(1)

  /** Per-day ingest report (11_ingest_fpl_bootstrap.py:164-172): count,
    * max ts, conditional ok-row sum (P7 CASE WHEN aggregate). */
  def ingestReport(bronze: DataFrame): DataFrame =
    bronze.groupBy(col("snapshot_date"))
      .agg(
        count(lit(1)).as("rows"),
        max(col("snapshot_ts")).as("max_snapshot_ts"),
        sum(when(col("http_status") === 200, 1).otherwise(0)).as("ok_rows"),
      )
      .orderBy(col("snapshot_date").desc)

  /** Test/ingest helper: build the payloads input frame from literals. */
  def payloadRows(spark: SparkSession,
                  rows: Seq[(java.sql.Timestamp, String, Int, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("snapshot_ts", "source_url", "http_status", "payload_json")
  }
}
