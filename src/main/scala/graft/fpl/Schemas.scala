package graft.fpl

import org.apache.spark.sql.types._

/** All fixed schemas of the FPL lakehouse, declared once.
  *
  * Mirrors the reference's dual declaration — Delta DDL
  * (resources/uc/objects.sql:79-261) and hand-built StructTypes for
  * `from_json` (notebooks/03_silver/31_build_silver_dims.py:63-115,225-238).
  * Bronze stays permissive (payload as STRING, schema-on-read); silver/gold
  * schemas are explicit — no inference anywhere.
  */
object Schemas {

  /** Bronze envelope (notebooks/00_admin/00_create_uc_objects.py:46-56;
    * ingest row at notebooks/01_bronze/11_ingest_fpl_bootstrap.py:91-101). */
  val bronzeEnvelope: StructType = StructType(Seq(
    StructField("snapshot_ts", TimestampType, nullable = false),
    StructField("ingest_ts", TimestampType, nullable = false),
    StructField("snapshot_date", DateType, nullable = false),
    StructField("run_id", StringType, nullable = false),
    StructField("source_url", StringType, nullable = false),
    StructField("http_status", IntegerType, nullable = false),
    StructField("payload_size_bytes", LongType),
    StructField("payload_sha256", StringType),
    StructField("payload_json", StringType),
  ))

  /** bootstrap-static `elements[]` (players) —
    * 31_build_silver_dims.py:63-85. now_cost is integer tenths of £m;
    * several numerics arrive as STRINGS from the API (see
    * Silver.toDoubleOrNull). */
  val element: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("first_name", StringType),
    StructField("second_name", StringType),
    StructField("web_name", StringType),
    StructField("team", IntegerType),
    StructField("element_type", IntegerType),
    StructField("status", StringType),
    StructField("now_cost", IntegerType),
    StructField("chance_of_playing_next_round", IntegerType),
    StructField("chance_of_playing_this_round", IntegerType),
    StructField("minutes", IntegerType),
    StructField("selected_by_percent", StringType),
    StructField("form", StringType),
    StructField("points_per_game", StringType),
    StructField("total_points", IntegerType),
    StructField("transfers_in_event", IntegerType),
    StructField("transfers_out_event", IntegerType),
    StructField("ep_next", StringType),
    StructField("ep_this", StringType),
    StructField("news", StringType),
    StructField("news_added", StringType),
  ))

  /** bootstrap-static `teams[]` — 31_build_silver_dims.py:87-93. */
  val team: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("short_name", StringType),
    StructField("strength", IntegerType),
    StructField("pulse_id", IntegerType),
  ))

  /** bootstrap-static `events[]` (gameweeks) — 31_build_silver_dims.py:95-109. */
  val gameweekEvent: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("deadline_time", StringType),
    StructField("finished", BooleanType),
    StructField("is_previous", BooleanType),
    StructField("is_current", BooleanType),
    StructField("is_next", BooleanType),
    StructField("data_checked", BooleanType),
    StructField("highest_score", IntegerType),
    StructField("average_entry_score", IntegerType),
    StructField("most_selected", IntegerType),
    StructField("most_transferred_in", IntegerType),
    StructField("top_element", IntegerType),
  ))

  /** Top-level bootstrap payload: struct of three arrays —
    * 31_build_silver_dims.py:111-115. */
  val bootstrap: StructType = StructType(Seq(
    StructField("elements", ArrayType(element)),
    StructField("teams", ArrayType(team)),
    StructField("events", ArrayType(gameweekEvent)),
  ))

  /** fixtures payload item — 31_build_silver_dims.py:225-238.
    * `event` (gameweek) is nullable: unscheduled fixtures. */
  val fixture: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("event", IntegerType),
    StructField("kickoff_time", StringType),
    StructField("team_h", IntegerType),
    StructField("team_a", IntegerType),
    StructField("team_h_difficulty", IntegerType),
    StructField("team_a_difficulty", IntegerType),
    StructField("finished", BooleanType),
    StructField("started", BooleanType),
    StructField("provisional_start_time", BooleanType),
    StructField("minutes", IntegerType),
    StructField("code", LongType),
  ))

  /** fixtures payload: bare array of structs — 31_build_silver_dims.py:244. */
  val fixturesPayload: ArrayType = ArrayType(fixture)

  /** silver.live_event target (declared, resources/uc/objects.sql:139-149).
    * `event_key` is the deterministic MERGE key. */
  val liveEvent: StructType = StructType(Seq(
    StructField("event_key", StringType, nullable = false),
    StructField("fixture_id", StringType),
    StructField("event_ts", TimestampType),
    StructField("team_id", StringType),
    StructField("player_id", StringType),
    StructField("event_type", StringType),
    StructField("payload", StringType),
    StructField("updated_at", TimestampType),
  ))

  /** bronze.live_events_stream_raw landing-file schema for the streaming
    * ingest (declared, resources/uc/objects.sql:45-57): raw JSON lines with
    * a corrupt-record rescue column (Auto Loader `_rescued_data` analog). */
  val liveEventRaw: StructType = StructType(Seq(
    StructField("event_key", StringType),
    StructField("fixture_id", StringType),
    StructField("event_ts", TimestampType),
    StructField("team_id", StringType),
    StructField("player_id", StringType),
    StructField("event_type", StringType),
    StructField("payload", StringType),
    StructField("_corrupt_record", StringType),
  ))
}
