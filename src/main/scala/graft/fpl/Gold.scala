package graft.fpl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gold layer: published dims, the fixture-difficulty horizon fact, the
  * player-horizon view, and the transfer recommender.
  *
  * Re-expresses notebooks/04_gold/41_publish_gold_dims.py,
  * 42_build_fixture_horizons.py, the view DDL
  * (notebooks/00_admin/00_create_uc_objects.py:312-324), and the declared
  * transfer-recommendation logic (docs/backlog.md:94-100,
  * resources/uc/objects.sql:250-261).
  */
object Gold {

  // ------------------------------------------------------------------- dims

  /** gold.dim_team (41_publish_gold_dims.py:14-23): pass-through publish. */
  def dimTeam(silverTeam: DataFrame): DataFrame = silverTeam.select(
    col("team_id").cast("int"), col("team_name"), col("team_short_name"),
    col("strength").cast("int"), col("pulse_id").cast("int"),
    col("source_snapshot_ts"), col("source_snapshot_date"), col("source_run_id"))

  /** gold.dim_player (41:41-64): adds `player_name = concat_ws(" ", first,
    * second)`. */
  def dimPlayer(silverPlayer: DataFrame): DataFrame = silverPlayer.select(
    col("player_id").cast("int"), col("team_id").cast("int"),
    col("position_id").cast("int"),
    concat_ws(" ", col("first_name"), col("second_name")).as("player_name"),
    col("web_name"), col("status"),
    col("now_cost").cast("int"), col("now_cost_million").cast("double"),
    col("minutes").cast("int"), col("selected_by_percent").cast("double"),
    col("form").cast("double"), col("points_per_game").cast("double"),
    col("total_points").cast("int"),
    col("ep_next").cast("double"), col("ep_this").cast("double"),
    col("chance_next_round").cast("int"), col("chance_this_round").cast("int"),
    col("news"), col("news_added_ts"),
    col("source_snapshot_ts"), col("source_snapshot_date"), col("source_run_id"))

  /** gold.dim_gameweek (41:83-100). */
  def dimGameweek(silverGameweek: DataFrame): DataFrame = silverGameweek.select(
    col("gameweek_id").cast("int"), col("gameweek_name"),
    col("deadline_time_ts"), col("finished").cast("boolean"),
    col("is_previous").cast("boolean"), col("is_current").cast("boolean"),
    col("is_next").cast("boolean"), col("data_checked").cast("boolean"),
    col("highest_score").cast("int"), col("average_entry_score").cast("int"),
    col("most_selected_player_id").cast("int"),
    col("most_transferred_in_player_id").cast("int"),
    col("top_element_player_id").cast("int"),
    col("source_snapshot_ts"), col("source_snapshot_date"), col("source_run_id"))

  /** gold.dim_fixture (41:119-135). */
  def dimFixture(silverFixture: DataFrame): DataFrame = silverFixture.select(
    col("fixture_id").cast("int"), col("gameweek_id").cast("int"),
    col("kickoff_ts"), col("team_h_id").cast("int"), col("team_a_id").cast("int"),
    col("team_h_difficulty").cast("int"), col("team_a_difficulty").cast("int"),
    col("finished").cast("boolean"), col("started").cast("boolean"),
    col("provisional_start_time").cast("boolean"), col("minutes").cast("int"),
    col("fixture_code").cast("bigint"),
    col("source_snapshot_ts"), col("source_snapshot_date"), col("source_run_id"))

  // ---------------------------------------------------------- horizon fact

  /** Anchor gameweek: prefer is_next, fall back to is_current
    * (42_build_fixture_horizons.py:15-21). One tiny aggregate job instead
    * of the reference's two collect round-trips. */
  def asOfGameweek(dimGameweek: DataFrame): Int = {
    val row = dimGameweek
      .agg(
        min(when(col("is_next") === true, col("gameweek_id"))).as("next_gw"),
        min(when(col("is_current") === true, col("gameweek_id"))).as("cur_gw"))
      .select(coalesce(col("next_gw"), col("cur_gw")).as("gw"))
      .head()
    if (row.isNullAt(0))
      throw new DQ.DQException("No current/next gameweek found in dim_gameweek")
    row.getInt(0)
  }

  /** Home/away unpivot (U1, 42:30-47): fixture rows → one
    * (team_id, gameweek_id, difficulty) relation via unionByName. */
  def teamFixtureDifficulty(dimFixture: DataFrame): DataFrame = {
    def arm(team: String, diff: String) = dimFixture.select(
      col(team).as("team_id"), col("gameweek_id"),
      col(diff).as("difficulty"),
      col("source_snapshot_ts"), col("source_snapshot_date"), col("source_run_id"))
    arm("team_h_id", "team_h_difficulty")
      .unionByName(arm("team_a_id", "team_a_difficulty"))
      .filter(col("gameweek_id").isNotNull)
  }

  /** gold.fact_team_fixture_horizon_snapshot (42:30-92): 3/5/8-gameweek
    * fixture-difficulty horizons per team.
    *
    * The reference builds three filtered aggregates and assembles them
    * with two left joins (42:52-73). Re-expressed Spark-first as ONE
    * aggregation with conditional (filtered) aggregates — a single
    * shuffle of the unpivoted fixture relation, no joins; at 1000× data
    * this is the minimal data movement. The reference's base-is-h3
    * semantics (teams with no fixture in the next 3 gameweeks are absent)
    * are preserved by the `h3_fixture_count > 0` filter. */
  def fixtureHorizons(dimFixture: DataFrame, asofGw: Int,
                      snapshotDate: java.sql.Date,
                      updatedAt: java.sql.Timestamp): DataFrame = {
    val futureFx = teamFixtureDifficulty(dimFixture)
      .filter(col("gameweek_id") >= lit(asofGw))
    def within(n: Int): Column = col("gameweek_id") < lit(asofGw + n)
    def h(n: Int): Seq[Column] = Seq(
      avg(when(within(n), col("difficulty"))).as(s"h${n}_avg_fdr"),
      count(when(within(n), 1)).as(s"h${n}_fixture_count"))
    val aggs = h(3) ++ h(5) ++ h(8)
    futureFx.groupBy("team_id")
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("h3_fixture_count") > 0)
      .withColumn("snapshot_date", lit(snapshotDate))
      .withColumn("asof_gameweek_id", lit(asofGw).cast("int"))
      .withColumn("updated_at", lit(updatedAt))
      .select(
        col("snapshot_date"), col("asof_gameweek_id"), col("team_id"),
        col("h3_avg_fdr"), col("h3_fixture_count"),
        col("h5_avg_fdr"), col("h5_fixture_count"),
        col("h8_avg_fdr"), col("h8_fixture_count"),
        col("updated_at"))
  }

  /** gold.vw_player_fixture_horizon (00_create_uc_objects.py:312-324):
    * players ⋈ team horizon fact on team_id — every player fans out to its
    * team's horizon row. Both sides are dims → broadcast hash join. */
  def playerFixtureHorizon(dimPlayer: DataFrame, horizonFact: DataFrame): DataFrame =
    dimPlayer.as("p")
      .join(broadcast(horizonFact.as("f")), col("p.team_id") === col("f.team_id"))
      .select(
        col("f.snapshot_date"), col("f.asof_gameweek_id"),
        col("p.player_id"), col("p.team_id"),
        col("f.h3_avg_fdr"), col("f.h3_fixture_count"),
        col("f.h5_avg_fdr"), col("f.h5_fixture_count"),
        col("f.h8_avg_fdr"), col("f.h8_fixture_count"),
        col("f.updated_at"))

  /** The reference's one real analytical query: top-20 easiest-fixture
    * players (42_build_fixture_horizons.py:136-139). Tie-broken by
    * player_id for determinism (divergence: reference relies on Spark's
    * unstable sort). */
  def easiestFixturePlayers(view: DataFrame, k: Int = 20): DataFrame =
    view.orderBy(col("h5_avg_fdr").asc, col("player_id").asc).limit(k)

  // ------------------------------------------------------- declared facts

  /** gold.fact_price_snapshot (declared: resources/uc/objects.sql:214-223;
    * notebooks/04_gold/43_build_fact_price_snapshot.py is empty): one row
    * per player per snapshot day, for "price deltas" analysis
    * (docs/backlog.md:46). */
  def factPriceSnapshot(dimPlayer: DataFrame, snapshotDate: java.sql.Date,
                        updatedAt: java.sql.Timestamp): DataFrame =
    dimPlayer.select(
      lit(snapshotDate).as("snapshot_date"),
      col("player_id").cast("int"),
      col("now_cost").cast("int").as("now_cost_tenths_million"),
      col("selected_by_percent").cast("double"),
      col("form").cast("double"),
      col("status"),
      lit(updatedAt).as("updated_at"))

  /** Price deltas between consecutive snapshots per player
    * (docs/backlog.md:46: "price deltas" over fact_price_snapshot) —
    * lag window, one shuffle on player_id. */
  def priceDeltas(priceSnapshots: DataFrame): DataFrame =
    graft.ops.WindowOps.snapshotDeltas(priceSnapshots, "player_id",
        "snapshot_date", "now_cost_tenths_million", "snapshot_date")
      .withColumnRenamed("prev_value", "prev_cost_tenths")
      .withColumnRenamed("delta", "cost_delta_tenths")

  /** gold.fact_player_gameweek (declared: resources/uc/objects.sql:226-235):
    * the core modelling grain. Input: per-event player history rows
    * (player_id, team_id, gameweek_id, minutes, points); output one row
    * per player × gameweek. One shuffle on the composite key. */
  def factPlayerGameweek(history: DataFrame,
                         updatedAt: java.sql.Timestamp): DataFrame =
    history.groupBy(col("gameweek_id").cast("int").as("gameweek_id"),
        col("player_id").cast("int").as("player_id"))
      .agg(
        max(col("team_id")).cast("int").as("team_id"),
        sum(col("minutes")).cast("int").as("minutes"),
        sum(col("points")).cast("int").as("points"))
      .withColumn("updated_at", lit(updatedAt))

  /** gold.fact_live_form (declared: resources/uc/objects.sql:238-246;
    * docs/backlog.md:79-81 "rolling form_score, minutes_risk"): rolling
    * `windowGws`-gameweek mean points (form) and minutes-shortfall risk per
    * player. Bounded rows frame → one shuffle on player_id, O(frame) state. */
  def factLiveForm(playerGameweek: DataFrame, windowGws: Int,
                   snapshotDate: java.sql.Date,
                   updatedAt: java.sql.Timestamp): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("player_id").orderBy(col("gameweek_id").asc)
      .rowsBetween(-(windowGws - 1), org.apache.spark.sql.expressions.Window.currentRow)
    playerGameweek.select(
      lit(snapshotDate).as("snapshot_date"),
      col("player_id").cast("string").as("player_id"),
      concat(lit("last_"), lit(windowGws), lit("_gws"),
        lit("@gw"), col("gameweek_id")).as("fixture_window"),
      avg(col("points")).over(w).as("form_score"),
      (lit(1.0) - least(avg(col("minutes")).over(w) / lit(90.0), lit(1.0)))
        .as("minutes_risk"),
      lit(updatedAt).as("updated_at"))
  }

  /** gold.fact_transfer_recommendation (declared:
    * resources/uc/objects.sql:249-260): the recommender's persisted
    * product row, with rationale + constraint flags. */
  def factTransferRecommendation(dimPlayer: DataFrame, squadIds: Seq[Int],
                                 bankTenths: Int, runId: String,
                                 snapshotDate: java.sql.Date,
                                 createdAt: java.sql.Timestamp): DataFrame =
    recommendTransfer(dimPlayer, squadIds, bankTenths).select(
      lit(runId).as("run_id"),
      lit(snapshotDate).as("snapshot_date"),
      col("out_player_id"), col("in_player_id"),
      col("expected_points_delta").cast("double"),
      col("cost_delta_tenths").cast("int").as("cost_delta_tenths_million"),
      lit("budget_ok,position_match,team_limit_ok").as("constraint_flags"),
      concat(lit("swap "), col("out_web_name"), lit(" -> "), col("in_web_name"),
        lit(" for +"), round(col("expected_points_delta"), 2),
        lit(" expected pts")).as("rationale"),
      lit(createdAt).as("created_at"))

  // ------------------------------------------------------------ recommender

  /** Deterministic transfer recommender (ML3, declared:
    * docs/backlog.md:94-100; output table resources/uc/objects.sql:250-261).
    *
    * Input: current squad (player_ids) + bank budget (tenths of £m).
    * Output: best single out→in transfer maximizing `ep_next` delta under
    * FPL constraints — affordable (in_cost ≤ out_cost + bank), same
    * position, ≤3 players per team after the swap.
    *
    * Shape: theta-join (squad × market candidates) + constraint predicates
    * + top-1. The squad side is ≤15 rows → broadcast; at any market size
    * this stays a broadcast nested-loop over a pruned market projection. */
  def recommendTransfer(dimPlayer: DataFrame, squadIds: Seq[Int],
                        bankTenths: Int): DataFrame = {
    val market = dimPlayer.select(
      col("player_id"), col("team_id"), col("position_id"),
      col("now_cost"), col("ep_next"), col("web_name"))
    val squad = market.filter(col("player_id").isin(squadIds: _*))
    val squadTeamCounts = squad.groupBy("team_id")
      .agg(count(lit(1)).as("squad_team_count"))

    val candidates = market
      .filter(!col("player_id").isin(squadIds: _*))
      .join(broadcast(squadTeamCounts), Seq("team_id"), "left")
      .na.fill(0L, Seq("squad_team_count"))

    val out = squad.select(
      col("player_id").as("out_player_id"), col("team_id").as("out_team_id"),
      col("position_id").as("out_position_id"), col("now_cost").as("out_cost"),
      col("ep_next").as("out_ep_next"), col("web_name").as("out_web_name"))

    candidates.join(broadcast(out),
        col("position_id") === col("out_position_id") &&
        col("now_cost") <= col("out_cost") + lit(bankTenths) &&
        // ≤3 per team after swap: selling from the same team frees a slot
        (col("squad_team_count") -
          when(col("team_id") === col("out_team_id"), 1).otherwise(0)) < 3)
      .select(
        col("out_player_id"), col("out_web_name"),
        col("player_id").as("in_player_id"), col("web_name").as("in_web_name"),
        (col("ep_next") - col("out_ep_next")).as("expected_points_delta"),
        (col("now_cost") - col("out_cost")).as("cost_delta_tenths"))
      .orderBy(col("expected_points_delta").desc,
        col("out_player_id").asc, col("in_player_id").asc)
      .limit(1)
  }
}
