package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.fpl.Schemas
import graft.tables.VersionedTable

/** Live-event streaming path — the reference's declared slice_v2
  * (notebooks/02_streaming/21_autoloader_live_events.py and
  * 03_silver/32/33 are empty; semantics from docs/backlog.md:63-81,
  * docs/architecture.md:103-129, resources/uc/objects.sql:30-57,137-161).
  *
  * OSS equivalents of the Databricks pieces:
  *  - Auto Loader `cloudFiles` JSON landing-dir ingest → `readStream
  *    .schema(...).json(dir)` with PERMISSIVE mode + `_corrupt_record`
  *    (the `_rescued_data` analog), `Trigger.AvailableNow`, checkpointed.
  *  - MERGE-on-write conformance → `foreachBatch` + VersionedTable.merge
  *    keyed on the deterministic `event_key` (rerun-safe, late-data
  *    tolerant — docs/backlog.md:75-78).
  */
object LiveEvents {

  /** Deterministic event key (resources/uc/objects.sql:138: "deterministic
    * event key = f(fixture, ts, event type, entity ids)"). Every field is
    * null-coalesced: concat_ws silently DROPS null arguments (no
    * separator), so without the guards two distinct events with nulls in
    * different fields could collide on the same key. */
  def eventKey(df: DataFrame): DataFrame = {
    def part(c: org.apache.spark.sql.Column) = coalesce(c.cast("string"), lit(""))
    df.withColumn("event_key",
      coalesce(col("event_key"),
        sha2(concat_ws("|", part(col("fixture_id")), part(col("event_ts")),
          part(col("event_type")), part(col("team_id")),
          part(col("player_id"))), 256)))
  }

  /** ST1: finite file-stream ingest of a JSON landing dir into the bronze
    * stream table. Returns after the availableNow drain completes. */
  def ingestAvailableNow(spark: SparkSession, landingDir: String,
                         checkpointDir: String, bronze: VersionedTable): Unit = {
    val stream = spark.readStream
      .schema(Schemas.liveEventRaw)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(landingDir)
    val q = stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        bronze.append(batch.withColumn("ingest_ts", current_timestamp()))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming schema evolution: Auto Loader's `rescuedDataColumn` analog
    * (docs/backlog.md:70-74, docs/architecture.md:117-129). The landing
    * stream is read as raw text lines: known fields parse against the
    * fixed schema, and any top-level JSON field NOT in the schema is
    * captured into the `_rescued_data` JSON-map column instead of being
    * silently dropped — a field added mid-stream is recoverable from
    * bronze (and carried to silver by [[conformToSilver]]) without a
    * schema migration. Malformed lines land whole in `_corrupt_record`.
    *
    * Detection trick: `from_json` to a struct NEVER returns null in
    * PERMISSIVE mode (all-null struct instead), so corruption is detected
    * on the map-parse being null — a line is either a JSON object (map
    * parses) or corrupt. Map-only, no shuffle, all codegen built-ins. */
  def ingestWithRescueAvailableNow(spark: SparkSession, landingDir: String,
                                   checkpointDir: String,
                                   bronze: VersionedTable): Unit = {
    import org.apache.spark.sql.types.{MapType, StringType, StructType}
    val knownFields = Schemas.liveEventRaw.fields
      .filterNot(_.name == "_corrupt_record")
    val known = knownFields.map(_.name).toSeq
    val parseSchema = StructType(knownFields.toIndexedSeq)
    val stream = spark.readStream.text(landingDir)
    val asMap = from_json(col("value"), MapType(StringType, StringType))
    val unknown = map_filter(col("__m"), (k, _) => !k.isin(known: _*))
    val parsed = stream
      .select(from_json(col("value"), parseSchema).as("__r"),
        asMap.as("__m"), col("value"))
      .select(
        (known.map(f => col(s"__r.$f")) ++ Seq(
          when(col("__m").isNull, col("value")).as("_corrupt_record"),
          when(col("__m").isNotNull && size(map_keys(unknown)) > 0,
            to_json(unknown)).as("_rescued_data"))): _*)
    val q = parsed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        bronze.append(batch.withColumn("ingest_ts", current_timestamp()))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** ST2+ST4: conform bronze live events → silver with watermarked
    * dedup-in-batch then MERGE upsert (late/re-delivered events replace by
    * event_key; newest updated_at wins). Runs as an availableNow stream
    * over the bronze table's current snapshot directory. */
  /** `bronzeGlob` must cover ALL of the bronze table's file-sets
    * (VersionedTable.dataGlob) — a single file-set dir would silently
    * miss events appended by other micro-batches/runs. */
  /** `partitionByEventDate` derives `snapshot_date = to_date(event_ts)`
    * and routes the MERGE to (partition, bucket) cells: the
    * `snapshot_date` partitioning the reference documents for its
    * live-event tables (docs/architecture.md:56, docs/backlog.md:45)
    * combined with keyed upsert. At production volume this makes
    * date-range reads prune whole cells and each drain rewrite only its
    * dates; the bench-scale default stays unpartitioned because cell
    * granularity should match volume.
    *
    * CONTRACT (the partition-stability rule of
    * [[graft.tables.VersionedTable.BucketSpec]]): a key's event DATE must
    * not change across deliveries. Derived keys satisfy this by
    * construction (the sha2 key embeds event_ts, so a changed timestamp
    * IS a different key); a producer supplying explicit event_keys must
    * not re-deliver a key with a corrected event_ts that crosses
    * midnight — the old date's row would survive as a duplicate, exactly
    * as with a Delta MERGE whose condition includes a partition
    * predicate. Such corrections must delete the old row first. */
  def conformToSilver(spark: SparkSession, bronzeGlob: String,
                      checkpointDir: String, silver: VersionedTable,
                      watermarkDelay: String = "1 hour",
                      partitionByEventDate: Boolean = false): Unit = {
    // mergeSchema: bronze may mix pre- and post-evolution file-sets (e.g.
    // `_rescued_data` appearing mid-feed); a plain read would take ONE
    // file's footer schema nondeterministically and could drop the column
    val stream = spark.readStream
      .schema(spark.read.option("mergeSchema", "true").parquet(bronzeGlob).schema)
      .parquet(bronzeGlob)
    // carry `_rescued_data` through when the bronze feed has it, so
    // schema-evolved fields stay recoverable in silver
    val silverCols = Seq("event_key", "fixture_id", "event_ts", "team_id",
      "player_id", "event_type", "payload", "updated_at") ++
      (if (stream.columns.contains("_rescued_data")) Seq("_rescued_data")
       else Nil)
    val base = eventKey(stream)
      .withWatermark("event_ts", watermarkDelay)
      .filter(col("_corrupt_record").isNull && col("event_key").isNotNull)
      .withColumn("updated_at", current_timestamp())
      .select(silverCols.map(col): _*)
    val conformed =
      if (partitionByEventDate)
        base.withColumn("snapshot_date", to_date(col("event_ts")).cast("string"))
      else base
    val q = conformed.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // txn = (this query's checkpoint, batchId): after a crash,
        // Structured Streaming REPLAYS the last uncommitted batch — the
        // ledger marker in the merge's own commit makes the replay a
        // metadata no-op instead of a re-applied upsert (Delta
        // txnAppId/txnVersion idempotent sinks)
        silver.merge(batch, Seq("event_key"), preferUpdateBy = Some("event_ts"),
          partitionBy =
            if (partitionByEventDate) Seq("snapshot_date") else Nil,
          txn = Some((s"conform@$checkpointDir", batchId)))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** ST3 (batch form): silver.live_fixture_state — latest score/status per
    * fixture from the event stream (resources/uc/objects.sql:151-161).
    * One shuffle on fixture_id; the streaming form is the same expression
    * under availableNow via foreachBatch + merge on fixture_id. */
  def latestFixtureState(silverEvents: DataFrame): DataFrame =
    graft.ops.Keyed.latestPerKey(silverEvents, Seq("fixture_id"),
        "event_ts", tieBreakers = Seq("event_key"))
      .select(col("fixture_id"), col("event_ts").as("state_ts"),
        col("event_type").as("last_event_type"), col("payload"),
        col("updated_at"))

  /** Accumulated per-fixture state for the stateful streaming form of ST3.
    * `last_event_key` is part of the state so the (ts, key) max-reduction
    * stays deterministic across arbitrary micro-batch splits. */
  final case class FixtureState(fixture_id: String, n_events: Long,
                                last_event_ts: java.sql.Timestamp,
                                last_event_key: String,
                                last_event_type: String)

  /** Input projection for [[fixtureStateStream]] (public: encoder codegen
    * needs access). */
  final case class EventIn(fixture_id: String,
                           event_ts: java.sql.Timestamp,
                           event_key: String, event_type: String)

  /** ST3 (stateful streaming form): per-fixture score/status state
    * maintained with `flatMapGroupsWithState` — Spark's native keyed-state
    * operator (the OSS analog of the declared live-state notebook,
    * notebooks/03_silver/33_build_silver_live_fixture_state.py, empty;
    * semantics resources/uc/objects.sql:151-161).
    *
    * Emits the updated state of every fixture touched by each micro-batch.
    * State is O(1) per fixture (count + latest event), partitioned by
    * fixture_id — scales to any number of concurrent fixtures. Determinism:
    * within a batch, events reduce by (max ts, tie-break max event_key),
    * so replays converge. Run with `Trigger.AvailableNow` over a landing
    * dir for the finite/batch-equivalent mode. */
  def fixtureStateStream(events: DataFrame): org.apache.spark.sql.Dataset[FixtureState] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .select(col("fixture_id").cast("string"), col("event_ts"),
        col("event_key").cast("string"), col("event_type").cast("string"))
      .as[EventIn]
      .groupByKey(_.fixture_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fixtureId: String, batch: Iterator[EventIn],
         state: GroupState[FixtureState]) =>
          var st = state.getOption.getOrElse(
            FixtureState(fixtureId, 0L, null, "", null))
          var latestTs = Option(st.last_event_ts)
          var latestKey = st.last_event_key
          var latestType = st.last_event_type
          batch.foreach { e =>
            st = st.copy(n_events = st.n_events + 1)
            // same tie-break as the batch latestFixtureState (max ts,
            // then SMALLEST event_key): batch and streaming forms must
            // agree on identical input
            val newer = latestTs.forall { ts =>
              e.event_ts.after(ts) ||
                (e.event_ts.equals(ts) && e.event_key < latestKey)
            }
            if (newer) {
              latestTs = Some(e.event_ts); latestKey = e.event_key
              latestType = e.event_type
            }
          }
          st = st.copy(last_event_ts = latestTs.orNull,
            last_event_key = latestKey, last_event_type = latestType)
          state.update(st)
          Iterator.single(st)
      }
  }

  /** [[FixtureState]] plus the TTL lifecycle flag: `is_final = true`
    * marks the single closing row emitted when a fixture's state
    * expires ([[fixtureStateStreamTtl]]). */
  final case class FixtureStateTtl(fixture_id: String, n_events: Long,
                                   last_event_ts: java.sql.Timestamp,
                                   last_event_key: String,
                                   last_event_type: String,
                                   is_final: Boolean)

  /** ST3 with BOUNDED state: the keyed fixture state under an
    * EVENT-TIME TTL. [[fixtureStateStream]]'s `NoTimeout` is fine for
    * the FPL fixture domain (~380 keys/season), but as the keyed-state
    * pattern this engine ships it must also demonstrate bounded state:
    * with unbounded keys (sessions, devices, documents) a state store
    * that never expires grows without limit and a 100 TB deployment
    * OOMs its executors or thrashes RocksDB.
    *
    * Mechanics: a watermark on `event_ts` plus
    * `GroupStateTimeout.EventTimeTimeout`. Every update re-arms the
    * fixture's timeout at `last_event_ts + ttl` (clamped above the
    * current watermark — Spark refuses a timeout at or below it); when
    * the watermark passes that point, the next micro-batch fires the
    * timed-out group with an empty input iterator, we emit ONE closing
    * row (`is_final = true` — the "fixture settled" signal downstream
    * consumers key on) and REMOVE the state. A later event for the same
    * fixture starts a fresh state (n_events restarts) — exactly the
    * session-window-reopen semantics Spark's own
    * `flatMapGroupsWithState` examples document. State size is thereby
    * O(keys active within the TTL horizon), not O(keys ever seen). */
  def fixtureStateStreamTtl(events: DataFrame, ttlMillis: Long,
      watermarkDelay: String = "10 minutes")
      : org.apache.spark.sql.Dataset[FixtureStateTtl] = {
    require(ttlMillis > 0, s"fixtureStateStreamTtl: ttl must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .withWatermark("event_ts", watermarkDelay)
      .select(col("fixture_id").cast("string"), col("event_ts"),
        col("event_key").cast("string"), col("event_type").cast("string"))
      .as[EventIn]
      .groupByKey(_.fixture_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (fixtureId: String, batch: Iterator[EventIn],
         state: GroupState[FixtureStateTtl]) =>
          if (state.hasTimedOut) {
            // watermark passed last_event_ts + ttl with no new events:
            // close the fixture and free its state slot
            val fin = state.get.copy(is_final = true)
            state.remove()
            Iterator.single(fin)
          } else {
            var st = state.getOption.getOrElse(
              FixtureStateTtl(fixtureId, 0L, null, "", null,
                is_final = false))
            var latestTs = Option(st.last_event_ts)
            var latestKey = st.last_event_key
            var latestType = st.last_event_type
            batch.foreach { e =>
              st = st.copy(n_events = st.n_events + 1)
              // same (max ts, then smallest event_key) tie-break as the
              // batch derivation and the NoTimeout form
              val newer = latestTs.forall { ts =>
                e.event_ts.after(ts) ||
                  (e.event_ts.equals(ts) && e.event_key < latestKey)
              }
              if (newer) {
                latestTs = Some(e.event_ts); latestKey = e.event_key
                latestType = e.event_type
              }
            }
            st = st.copy(last_event_ts = latestTs.orNull,
              last_event_key = latestKey, last_event_type = latestType)
            state.update(st)
            // re-arm: expire ttl past the newest event, never at/below
            // the current watermark (Spark rejects that)
            val target = latestTs.map(_.getTime + ttlMillis)
              .getOrElse(state.getCurrentWatermarkMs() + ttlMillis)
            state.setTimeoutTimestamp(
              math.max(target, state.getCurrentWatermarkMs() + 1L))
            Iterator.single(st)
          }
      }
  }

  /** Finite run of [[fixtureStateStreamTtl]] over a JSON landing dir:
    * drains with availableNow, APPENDING every emitted row to `out`
    * (the state-transition timeline, including `is_final` closings —
    * unlike the merge-latest NoTimeout runner, closings and reopenings
    * must both stay visible). Exactly-once per batch via txn markers. */
  def runFixtureStateTtlAvailableNow(spark: SparkSession, landingDir: String,
                                     checkpointDir: String,
                                     out: VersionedTable,
                                     ttlMillis: Long,
                                     watermarkDelay: String = "0 seconds"): Unit = {
    val stream = spark.readStream
      .schema(Schemas.liveEventRaw)
      .json(landingDir)
      .filter(col("_corrupt_record").isNull && col("fixture_id").isNotNull &&
        col("event_ts").isNotNull && col("event_key").isNotNull)
    val states = fixtureStateStreamTtl(stream, ttlMillis, watermarkDelay).toDF()
    val q = states.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        out.append(batch, txn = Some((s"state-ttl@$checkpointDir", batchId)))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Finite run of [[fixtureStateStream]] over a JSON landing dir: drains
    * with availableNow, merging each batch's emitted states into `out`
    * keyed by fixture (newest batch wins). Returns after the drain. */
  def runFixtureStateAvailableNow(spark: SparkSession, landingDir: String,
                                  checkpointDir: String,
                                  out: VersionedTable): Unit = {
    val stream = spark.readStream
      .schema(Schemas.liveEventRaw)
      .json(landingDir)
      // quarantine malformed lines and rows missing the state keys —
      // a null event_ts/event_key would NPE the state reducer
      .filter(col("_corrupt_record").isNull && col("fixture_id").isNotNull &&
        col("event_ts").isNotNull && col("event_key").isNotNull)
    val states = fixtureStateStream(stream).toDF()
    val q = states.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        out.merge(batch, Seq("fixture_id"), preferUpdateBy = Some("n_events"))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming dedup with bounded state: drops re-deliveries of the same
    * `event_key` arriving within the watermark delay. State evicts with
    * the watermark (O(keys-per-watermark-window), not O(stream)) — the
    * in-stream complement to the MERGE-on-write dedup of
    * [[conformToSilver]] (which handles re-deliveries across restarts). */
  def dedupWithinWatermark(events: DataFrame,
                           watermarkDelay: String = "1 hour"): DataFrame =
    events.withWatermark("event_ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_key")

  /** Tumbling event-time window aggregation (the `fixture_window` concept
    * of gold.fact_live_form, resources/uc/objects.sql:242): events per
    * (fixture, window). Works identically on batch and streaming inputs;
    * in streaming pair with [[runWindowedCountsAvailableNow]] which adds
    * the watermark (ST4 late-data bound). */
  def eventCountsByWindow(events: DataFrame,
                          windowLength: String = "1 hour"): DataFrame =
    events.groupBy(col("fixture_id"),
        window(col("event_ts"), windowLength).as("w"))
      .agg(count(lit(1)).as("n_events"),
        max(col("event_ts")).as("max_event_ts"))
      .select(col("fixture_id"), col("w.start").as("window_start"),
        col("n_events"), col("max_event_ts"))

  /** ST4: watermarked tumbling-window counts over a JSON landing dir,
    * drained with availableNow into `out`. The watermark bounds state:
    * windows older than (max event time - delay) finalize and evict —
    * state is O(open windows), not O(stream length). */
  def runWindowedCountsAvailableNow(spark: SparkSession, landingDir: String,
                                    checkpointDir: String, out: VersionedTable,
                                    windowLength: String = "1 hour",
                                    watermarkDelay: String = "2 hours"): Unit = {
    val stream = spark.readStream.schema(Schemas.liveEventRaw).json(landingDir)
    val counts = eventCountsByWindow(
      stream.withWatermark("event_ts", watermarkDelay), windowLength)
    val q = counts.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        out.merge(batch, Seq("fixture_id", "window_start"),
          preferUpdateBy = Some("n_events"))
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** ST7: STREAM-STREAM interval join with watermarks on both sides —
    * the view→purchase attribution shape: each 'purchase' event joins
    * the same user's 'view' events at most `horizon` earlier. The
    * event-time bound plus both watermarks is the canonical recipe that
    * lets Spark EVICT join state once the watermark passes the interval:
    * buffered state is O(events within horizon+delay), never the whole
    * stream — the property that makes stream-stream joins viable on an
    * unbounded 100 TB/day feed. Inner join → append output mode. */
  def runViewPurchaseJoinAvailableNow(spark: SparkSession, landingDir: String,
                                      checkpointDir: String, out: VersionedTable,
                                      horizon: String = "1 hour",
                                      watermarkDelay: String = "2 hours"): Unit = {
    val raw = spark.readStream.schema(Schemas.liveEventRaw).json(landingDir)
    val views = raw.filter(col("event_type") === "view")
      .select(col("player_id").as("user_id"),
        col("event_ts").as("view_ts"), col("event_key").as("view_key"))
      .withWatermark("view_ts", watermarkDelay)
    val purchases = raw.filter(col("event_type") === "purchase")
      .select(col("player_id").as("p_user"),
        col("event_ts").as("purchase_ts"),
        col("event_key").as("purchase_key"))
      .withWatermark("purchase_ts", watermarkDelay)
    val joined = purchases.join(views,
      col("user_id") === col("p_user") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"interval $horizon"))
      .select(col("p_user").as("user_id"), col("purchase_key"),
        col("purchase_ts"), col("view_key"), col("view_ts"))
    val q = joined.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // unconditional: an empty batch still writes a schema-bearing
        // file-set, so a zero-match join yields a readable EMPTY table
        // instead of a never-created one that errors on read
        out.append(batch); ()
      }
      .start()
    q.awaitTermination()
  }

  /** Per-fixture event timeline with running event count — the
    * score/status timeline shape of silver.live_fixture_state. */
  def fixtureTimeline(silverEvents: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("fixture_id")
      .orderBy(col("event_ts").asc, col("event_key").asc)
    silverEvents.select(
      col("fixture_id"), col("event_ts"), col("event_type"),
      row_number().over(w).as("event_seq"),
      count(lit(1)).over(w.rowsBetween(Long.MinValue, 0)).as("events_so_far"))
  }
}
