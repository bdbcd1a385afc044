package graft.streaming

import graft.SparkSpec
import graft.tables.VersionedTable
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class LiveEventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  private def silverEvents = Seq(
    ("k1", "f1", ts(10), "p1", "goal", "{}", ts(100)),
    ("k2", "f1", ts(20), "p2", "card", "{}", ts(100)),
    ("k3", "f2", ts(5), "p3", "start", "{}", ts(100)),
  ).toDF("event_key", "fixture_id", "event_ts", "player_id",
    "event_type", "payload", "updated_at")
    .select($"event_key", $"fixture_id", $"event_ts",
      lit(null).cast("string").as("team_id"), $"player_id",
      $"event_type", $"payload", $"updated_at")

  test("eventKey is deterministic and fills only missing keys") {
    val df = Seq(
      (null.asInstanceOf[String], "f1", ts(10), "goal"),
      ("explicit", "f1", ts(10), "goal"),
    ).toDF("event_key", "fixture_id", "event_ts", "event_type")
      .withColumn("team_id", lit(null).cast("string"))
      .withColumn("player_id", lit("p1"))
    val keys = LiveEvents.eventKey(df).select("event_key").as[String].collect()
    assert(keys(1) === "explicit")
    assert(keys(0).length === 64) // sha256 hex
    // determinism: same inputs -> same derived key
    val again = LiveEvents.eventKey(df).select("event_key").as[String].collect()
    assert(keys(0) === again(0))
  }

  test("latestFixtureState keeps the newest event per fixture") {
    val out = LiveEvents.latestFixtureState(silverEvents)
      .select("fixture_id", "last_event_type")
      .as[(String, String)].collect().toSet
    assert(out === Set(("f1", "card"), ("f2", "start")))
  }

  test("fixtureTimeline assigns monotone sequence numbers per fixture") {
    val out = LiveEvents.fixtureTimeline(silverEvents)
      .select("fixture_id", "event_seq", "events_so_far")
      .as[(String, Int, Long)].collect()
    out.foreach { case (_, seq, sofar) => assert(seq.toLong === sofar) }
    assert(out.count(_._1 == "f1") === 2)
  }

  test("rescue ingest: mid-stream field lands in _rescued_data, recoverable in silver") {
    import java.nio.file.{Files, Paths}
    val tmp = tmpDir("rescue-")
    val landing = s"$tmp/landing"
    Files.createDirectories(Paths.get(landing))
    // batch 1: schema-conformant row + a malformed line
    Files.writeString(Paths.get(landing, "b1.json"),
      """{"event_key":"k1","fixture_id":"f1","event_ts":"2025-08-12T10:00:00.000Z","event_type":"goal","payload":"{}"}""" +
        "\nnot json at all\n")
    // batch 2: the producer added a NEW field `xg` mid-stream
    Files.writeString(Paths.get(landing, "b2.json"),
      """{"event_key":"k2","fixture_id":"f1","event_ts":"2025-08-12T10:05:00.000Z","event_type":"card","payload":"{}","xg":"0.42"}""" + "\n")
    val bronze = VersionedTable(spark, s"$tmp/bronze")
    LiveEvents.ingestWithRescueAvailableNow(spark, landing, s"$tmp/cp", bronze)
    val b = bronze.read
    assert(b.filter(col("_corrupt_record").isNotNull).count() === 1)
    val rescued = b.filter(col("_rescued_data").isNotNull)
    assert(rescued.select("event_key").as[String].collect().toSeq === Seq("k2"))
    assert(rescued.select(get_json_object(col("_rescued_data"), "$.xg"))
      .as[String].collect().head === "0.42")
    // unevolved rows keep a null rescue column
    assert(b.filter(col("event_key") === "k1")
      .select("_rescued_data").collect().head.isNullAt(0))
    // conform carries the rescued column into silver
    val silver = VersionedTable(spark, s"$tmp/silver")
    LiveEvents.conformToSilver(spark, bronze.dataGlob, s"$tmp/cp2", silver)
    assert(silver.read.columns.contains("_rescued_data"))
    assert(silver.read.filter(col("event_key") === "k2")
      .select(get_json_object(col("_rescued_data"), "$.xg"))
      .as[String].collect().head === "0.42")
    assert(silver.read.count() === 2) // corrupt line filtered out
  }

  test("conformToSilver(partitionByEventDate) lands a partition-bucketed silver") {
    val tmp = tmpDir("pconform-")
    silverEvents.drop("updated_at").write.json(s"$tmp/landing")
    val bronze = VersionedTable(spark, s"$tmp/bronze")
    LiveEvents.ingestAvailableNow(spark, s"$tmp/landing", s"$tmp/cp1", bronze)
    val silver = VersionedTable(spark, s"$tmp/silver")
    LiveEvents.conformToSilver(spark, bronze.dataGlob, s"$tmp/cp2", silver,
      partitionByEventDate = true)
    assert(silver.read.count() === 3)
    assert(silver.read.columns.contains("snapshot_date"))
    // the layout is (date, bucket) cells — the Delta-style combination of
    // snapshot_date pruning and keyed MERGE the reference intends
    assert(silver.history.last.fileSets.forall(_.matches(""".*\.p[^.]*\.b\d+$""")),
      s"expected cells: ${silver.history.last.fileSets}")
    assert(silver.bucketSpec.exists(_.partitionKeys === Seq("snapshot_date")))
    // re-delivery stays idempotent through the partitioned path
    LiveEvents.conformToSilver(spark, bronze.dataGlob, s"$tmp/cp3", silver,
      partitionByEventDate = true)
    assert(silver.read.count() === 3)
  }

  test("streaming dedup drops re-delivered event keys within the watermark") {
    val tmp = tmpDir("dedup-")
    // k1 delivered twice (same key), k2 once
    silverEvents.drop("updated_at")
      .unionByName(silverEvents.drop("updated_at").filter($"event_key" === "k1"))
      .write.json(s"$tmp/landing")
    val out = VersionedTable(spark, s"$tmp/out")
    val stream = spark.readStream
      .schema(graft.fpl.Schemas.liveEventRaw).json(s"$tmp/landing")
      .filter($"_corrupt_record".isNull)
    val q = LiveEvents.dedupWithinWatermark(stream)
      .writeStream
      .option("checkpointLocation", s"$tmp/cp")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        out.append(b.drop("_corrupt_record")); ()
      }.start()
    q.awaitTermination()
    assert(out.read.count() === 3) // 4 delivered, 1 duplicate dropped
    assert(out.read.filter($"event_key" === "k1").count() === 1)
  }

  test("corrupt landing records are quarantined, not propagated to silver") {
    val tmp = tmpDir("corrupt-")
    // two good records + one malformed line in the landing dir
    silverEvents.drop("updated_at").limit(2).write.json(s"$tmp/landing")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$tmp/landing/part-corrupt.json"),
      "{this is not json\n")
    val bronze = VersionedTable(spark, s"$tmp/bronze")
    LiveEvents.ingestAvailableNow(spark, s"$tmp/landing", s"$tmp/cp1", bronze)
    // bronze keeps everything (permissive) with the corrupt line captured
    assert(bronze.read.count() === 3)
    assert(bronze.read.filter($"_corrupt_record".isNotNull).count() === 1)
    val silver = VersionedTable(spark, s"$tmp/silver")
    LiveEvents.conformToSilver(spark, bronze.dataGlob, s"$tmp/cp2", silver)
    // silver gets only the 2 valid events
    assert(silver.read.count() === 2)
  }

  test("windowed counts: streaming availableNow equals the batch expression") {
    val tmp = tmpDir("win-")
    val evts = Seq(
      ("k1", "f1", ts(600), "p1", "goal", "{}"),     // 00:10
      ("k2", "f1", ts(1200), "p2", "card", "{}"),    // 00:20
      ("k3", "f1", ts(4200), "p3", "goal", "{}"),    // 01:10
      ("k4", "f2", ts(300), "p4", "kickoff", "{}"),  // 00:05
    ).toDF("event_key", "fixture_id", "event_ts", "player_id",
      "event_type", "payload")
    evts.write.json(s"$tmp/landing")
    val out = VersionedTable(spark, s"$tmp/win")
    LiveEvents.runWindowedCountsAvailableNow(spark, s"$tmp/landing",
      s"$tmp/cp", out)
    val streamed = out.read
      .select("fixture_id", "window_start", "n_events")
      .as[(String, java.sql.Timestamp, Long)].collect().toSet
    val batch = LiveEvents.eventCountsByWindow(
      evts.withColumn("team_id", org.apache.spark.sql.functions.lit(null)))
      .select("fixture_id", "window_start", "n_events")
      .as[(String, java.sql.Timestamp, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.map(r => (r._1, r._3)) ===
      Set(("f1", 2L), ("f1", 1L), ("f2", 1L)))
  }

  test("stateful fixture-state stream equals the batch derivation") {
    val tmp = tmpDir("state-")
    silverEvents.drop("updated_at").write.json(s"$tmp/landing")
    val out = VersionedTable(spark, s"$tmp/state")
    LiveEvents.runFixtureStateAvailableNow(spark, s"$tmp/landing",
      s"$tmp/cp", out)
    val streamed = out.read
      .select("fixture_id", "n_events", "last_event_type")
      .as[(String, Long, String)].collect().toSet
    assert(streamed === Set(("f1", 2L, "card"), ("f2", 1L, "start")))
    // feeding more events through the same checkpoint accumulates state
    Seq(("k4", "f2", ts(30), "p4", "goal", "{}"))
      .toDF("event_key", "fixture_id", "event_ts", "player_id",
        "event_type", "payload")
      .write.mode("append").json(s"$tmp/landing")
    LiveEvents.runFixtureStateAvailableNow(spark, s"$tmp/landing",
      s"$tmp/cp", out)
    val after = out.read
      .select("fixture_id", "n_events", "last_event_type")
      .as[(String, Long, String)].collect().toSet
    assert(after === Set(("f1", 2L, "card"), ("f2", 2L, "goal")))
  }

  test("event-time TTL bounds the fixture state: final row on expiry, " +
       "fresh state on reopen") {
    val tmp = tmpDir("state-ttl-")
    val out = VersionedTable(spark, s"$tmp/state")
    val ttlMs = 3600L * 1000                      // 1 hour of event time
    def run(rows: Seq[(String, String, Timestamp, String, String, String)]): Unit = {
      rows.toDF("event_key", "fixture_id", "event_ts", "player_id",
          "event_type", "payload")
        .coalesce(1).write.mode("append").json(s"$tmp/landing")
      LiveEvents.runFixtureStateTtlAvailableNow(spark, s"$tmp/landing",
        s"$tmp/cp", out, ttlMs, watermarkDelay = "0 seconds")
    }
    def states = out.read
      .select("fixture_id", "n_events", "last_event_type", "is_final")
      .as[(String, Long, String, Boolean)].collect().toSeq
      .sortBy(r => (r._1, r._2, r._4))
    // run 1: f1 latest at 1200s, f2 at 300s — watermark ends at 1200s,
    // expiries armed at 4800s / 3900s; nothing fires
    run(Seq(("k1", "f1", ts(600), "p1", "goal", "{}"),
      ("k2", "f1", ts(1200), "p2", "card", "{}"),
      ("k3", "f2", ts(300), "p3", "kickoff", "{}")))
    assert(states === Seq(("f1", 2L, "card", false),
      ("f2", 1L, "kickoff", false)))
    // run 2: f2 jumps to 10000s, pushing the watermark past f1's 4800s
    // expiry — the engine's trailing no-data micro-batch fires the
    // timeout in the same drain: f1 emits ONE closing row (is_final,
    // the settled n_events=2 state) and frees its state slot; f2 (just
    // re-armed to 13600s) stays live
    run(Seq(("k4", "f2", ts(10000), "p4", "goal", "{}")))
    assert(states.filter(_._1 == "f1") ===
      Seq(("f1", 2L, "card", false), ("f1", 2L, "card", true)))
    assert(states.filter(_._1 == "f2").map(_._2).max === 2L)
    assert(!states.exists(r => r._1 == "f2" && r._4),
      "a re-armed live fixture must not expire")
    // run 3: a NEW f1 event after expiry starts a FRESH state —
    // n_events restarts at 1, proving the slot was removed, not parked
    run(Seq(("k5", "f1", ts(10010), "p5", "goal", "{}")))
    assert(states.filter(r => r._1 == "f1" && !r._4).map(_._2).toSet ===
      Set(2L, 1L))
    assert(states.count(_._4) === 1, "exactly one closing row so far")
  }

  test("availableNow ingest + conform: stream lands in bronze, merges to silver") {
    val tmp = tmpDir("les-")
    val landing = s"$tmp/landing"
    silverEvents.drop("updated_at").write.json(landing)
    val bronze = VersionedTable(spark, s"$tmp/bronze")
    LiveEvents.ingestAvailableNow(spark, landing, s"$tmp/cp1", bronze)
    assert(bronze.read.count() === 3)
    val silver = VersionedTable(spark, s"$tmp/silver")
    LiveEvents.conformToSilver(spark, bronze.dataGlob, s"$tmp/cp2", silver)
    assert(silver.read.count() === 3)
    // re-run with same checkpoint: no new data -> silver unchanged
    LiveEvents.conformToSilver(spark, bronze.dataGlob, s"$tmp/cp2", silver)
    assert(silver.read.count() === 3)
    // a SECOND ingest run appends a NEW bronze file-set; conform must see
    // it (the dataGlob covers all file-sets, not just the first)
    Seq(("k9", "f9", ts(99), "p9", "goal", "{}"))
      .toDF("event_key", "fixture_id", "event_ts", "player_id",
        "event_type", "payload")
      .write.mode("append").json(landing)
    LiveEvents.ingestAvailableNow(spark, landing, s"$tmp/cp1", bronze)
    LiveEvents.conformToSilver(spark, bronze.dataGlob, s"$tmp/cp2", silver)
    assert(silver.read.count() === 4)
    assert(silver.read.filter($"event_key" === "k9").count() === 1)
  }

  test("stream-stream join: same-user views within horizon, others excluded") {
    val tmp = tmpDir("ssj-")
    // u1: view at t=9500 and purchase at t=10000 (within 1h) → joins;
    //     a view at t=100 is 9900s before — OUTSIDE the 1h horizon →
    //     excluded BY THE INTERVAL BOUND (post-epoch on purpose: a
    //     pre-epoch ts could be dropped by batch-0 watermark filtering
    //     instead, leaving the horizon bound untested)
    // u2: view AFTER the purchase → excluded
    // u3: purchase with no view → excluded (inner join)
    Seq(
      ("v1", "u1", ts(9500), "view"),
      ("v0", "u1", ts(100), "view"),
      ("p1", "u1", ts(10000), "purchase"),
      ("v2", "u2", ts(11000), "view"),
      ("p2", "u2", ts(10500), "purchase"),
      ("p3", "u3", ts(10300), "purchase"),
    ).toDF("event_key", "player_id", "event_ts", "event_type")
      .withColumn("fixture_id", lit("f"))
      .withColumn("team_id", lit(null).cast("string"))
      .withColumn("payload", lit("{}"))
      .coalesce(1).write.json(s"$tmp/landing")
    val out = VersionedTable(spark, s"$tmp/joined")
    LiveEvents.runViewPurchaseJoinAvailableNow(spark, s"$tmp/landing",
      s"$tmp/cp", out)
    val rows = out.read.select("user_id", "purchase_key", "view_key")
      .as[(String, String, String)].collect().toSet
    assert(rows === Set(("u1", "p1", "v1")))
  }
}
