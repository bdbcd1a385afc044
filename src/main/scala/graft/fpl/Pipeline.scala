package graft.fpl

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tables.VersionedTable
import java.sql.{Date, Timestamp}

/** Slice orchestration: the reference's Databricks Workflow DAG
  * (resources/workflows/slice_v1_fpl_bootstrap.yml:29-57 — bronze ingest →
  * silver dims → gold dims → horizon fact) as plain function composition.
  * State passes only through tables between stages, preserving the
  * reference's idempotency/replayability property (each notebook boundary
  * is a process boundary, SURVEY.md §3 E1).
  */
final class Pipeline(spark: SparkSession, warehouse: String) {

  def table(layer: String, name: String): VersionedTable =
    VersionedTable(spark, s"$warehouse/$layer/$name")

  /** Task 1: bronze ingest of pre-landed payloads, idempotent on
    * (snapshot_date, payload_sha256). */
  def ingestBronze(payloads: DataFrame, runId: String, tableName: String): Long = {
    val bronze = table("bronze", tableName)
    val envelopes = Bronze.envelope(payloads, runId)
    val fresh = if (bronze.exists)
      Bronze.dedupAgainst(envelopes, bronze.read) else envelopes
    if (fresh.limit(1).count() > 0) bronze.append(fresh)
    if (bronze.exists) bronze.read.count() else 0L
  }

  /** Task 2: silver dims from the latest successful bronze snapshots. */
  def buildSilverDims(): Unit = {
    val bootstrapEnv = Bronze.latestOk(table("bronze", "fpl_bootstrap_raw").read)
    DQ.assertNonEmpty(bootstrapEnv, "bronze.fpl_bootstrap_raw (ok rows)")
    val parsed = Silver.parseBootstrap(bootstrapEnv)
    DQ.assertParsed(parsed, "j", "silver bootstrap")

    val fxEnv = Bronze.latestOk(table("bronze", "fpl_fixtures_raw").read)
    DQ.assertNonEmpty(fxEnv, "bronze.fpl_fixtures_raw (ok rows)")
    val parsedFx = Silver.parseFixtures(fxEnv)
    DQ.assertParsed(parsedFx, "fx", "silver fixtures")

    val teams = Silver.teams(parsed)
    val players = Silver.players(parsed)
    val gameweeks = Silver.gameweeks(parsed)
    val fixtures = Silver.fixtures(parsedFx)
    Silver.assertSilverDq(teams, players, gameweeks, fixtures)

    table("silver", "team").overwrite(teams)
    table("silver", "player").overwrite(players)
    table("silver", "gameweek").overwrite(gameweeks)
    table("silver", "fixture").overwrite(fixtures)
  }

  /** Task 3: publish gold dims. */
  def publishGoldDims(): Unit = {
    val dimTeam = Gold.dimTeam(table("silver", "team").read)
    val dimPlayer = Gold.dimPlayer(table("silver", "player").read)
    val dimGameweek = Gold.dimGameweek(table("silver", "gameweek").read)
    val dimFixture = Gold.dimFixture(table("silver", "fixture").read)
    DQ.assertPk(dimTeam, "team_id", "gold.dim_team")
    DQ.assertPk(dimPlayer, "player_id", "gold.dim_player")
    DQ.assertPk(dimGameweek, "gameweek_id", "gold.dim_gameweek")
    DQ.assertPk(dimFixture, "fixture_id", "gold.dim_fixture")
    table("gold", "dim_team").overwrite(dimTeam)
    table("gold", "dim_player").overwrite(dimPlayer)
    table("gold", "dim_gameweek").overwrite(dimGameweek)
    table("gold", "dim_fixture").overwrite(dimFixture)
  }

  /** Task 4: horizon fact snapshot. */
  def buildHorizonFact(snapshotDate: Date, updatedAt: Timestamp): Unit = {
    val gw = table("gold", "dim_gameweek").read
    val asof = Gold.asOfGameweek(gw)
    val fact = Gold.fixtureHorizons(table("gold", "dim_fixture").read,
      asof, snapshotDate, updatedAt)
    DQ.assertPk(fact, "team_id", "gold.fact_team_fixture_horizon_snapshot")
    table("gold", "fact_team_fixture_horizon_snapshot").overwrite(fact)
  }

  /** The player-horizon view (computed, like CREATE OR REPLACE VIEW). */
  def playerFixtureHorizon(): DataFrame =
    Gold.playerFixtureHorizon(
      table("gold", "dim_player").read,
      table("gold", "fact_team_fixture_horizon_snapshot").read)

  /** slice_v2 "live pulse" (declared: resources/workflows/
    * slice_v2_live_pulse.yml is empty; semantics docs/backlog.md:63-81):
    * land live-event JSON → availableNow bronze ingest → conform to
    * silver with MERGE on event_key → derive live fixture state (both the
    * batch and the stateful-streaming form land in tables). */
  def runSliceV2(landingDir: String, checkpointRoot: String): DataFrame = {
    val bronze = table("bronze", "live_events_stream_raw")
    graft.streaming.LiveEvents.ingestAvailableNow(spark, landingDir,
      s"$checkpointRoot/bronze", bronze)
    val silver = table("silver", "live_event")
    graft.streaming.LiveEvents.conformToSilver(spark, bronze.dataGlob,
      s"$checkpointRoot/silver", silver)
    val state = graft.streaming.LiveEvents.latestFixtureState(silver.read)
    table("silver", "live_fixture_state").overwrite(state)
    state
  }

  /** slice_v3 "transfer reco" (declared: resources/workflows/
    * slice_v3_transfer_reco.yml is empty; semantics docs/backlog.md:84-100):
    * price snapshot → live form → ML features → GBT points model →
    * deterministic transfer recommendation, all persisted to gold. */
  def runSliceV3(history: DataFrame, squadIds: Seq[Int], bankTenths: Int,
                 runId: String, snapshotDate: Date,
                 now: Timestamp): DataFrame = {
    val dimPlayer = table("gold", "dim_player").read
    val price = Gold.factPriceSnapshot(dimPlayer, snapshotDate, now)
    // rerun-idempotent like bronze's sha-guard: skip the append when this
    // snapshot_date is already present (the one-row-per-player-per-day
    // grain must survive reruns)
    val priceTable = table("gold", "fact_price_snapshot")
    val dateExists = priceTable.exists && priceTable.read
      .filter(org.apache.spark.sql.functions.col("snapshot_date") ===
        snapshotDate).limit(1).count() > 0
    if (!dateExists)
      priceTable.append(price, partitionBy = Seq("snapshot_date"))

    val pg = Gold.factPlayerGameweek(history, now)
    DQ.assertNoDuplicateKeys(pg, "gold.fact_player_gameweek",
      "gameweek_id", "player_id")
    table("gold", "fact_player_gameweek").overwrite(pg)

    val liveForm = Gold.factLiveForm(pg, windowGws = 3, snapshotDate, now)
    table("gold", "fact_live_form").overwrite(liveForm)

    val fdr = Gold.teamFixtureDifficulty(table("gold", "dim_fixture").read)
    val features = graft.ml.Points.features(pg,
      price.select("player_id", "now_cost_tenths_million"), fdr)
    val trained = graft.ml.Points.trainGBT(features, maxIter = 5)
    table("gold", "ml_points_metrics").overwrite(
      graft.ml.Points.metricsRow(spark, trained))

    val reco = Gold.factTransferRecommendation(dimPlayer, squadIds,
      bankTenths, runId, snapshotDate, now)
    // keyed on (run_id, snapshot_date): re-running a slice is idempotent
    // (same rerun-safety contract as bronze's sha-guard and the live-event
    // MERGE), while new runs append new product rows
    table("gold", "fact_transfer_recommendation")
      .merge(reco, Seq("run_id", "snapshot_date"))
    reco
  }

  /** Run the whole slice_v1 DAG over synthetic payloads. Returns the
    * flagship query result (top-20 easiest-fixture players). */
  def runSliceV1(runId: String = "run-1"): DataFrame = {
    val ts = Timestamp.valueOf("2025-08-12 06:15:00")
    val payloads = Bronze.payloadRows(spark, Seq(
      (ts, "https://fantasy.premierleague.com/api/bootstrap-static/", 200,
        SampleData.bootstrapJson())))
    val fxPayloads = Bronze.payloadRows(spark, Seq(
      (ts, "https://fantasy.premierleague.com/api/fixtures/", 200,
        SampleData.fixturesJson())))
    ingestBronze(payloads, runId, "fpl_bootstrap_raw")
    ingestBronze(fxPayloads, runId, "fpl_fixtures_raw")
    buildSilverDims()
    publishGoldDims()
    buildHorizonFact(Date.valueOf("2025-08-12"), ts)
    Gold.easiestFixturePlayers(playerFixtureHorizon())
  }
}
