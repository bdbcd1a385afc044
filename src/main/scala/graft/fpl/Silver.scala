package graft.fpl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Silver layer: typed, deduplicated entities parsed from bronze payloads.
  *
  * Faithful re-expression of notebooks/03_silver/31_build_silver_dims.py:
  * `from_json` → `explode` → typed select with renames/casts, preserving the
  * reference's quirks bit-for-bit (string-numeric null coercion :156-158,
  * money scaling :172, `dropDuplicates` on fixtures :272).
  */
object Silver {

  /** The reference's `to_double_or_null` (31_build_silver_dims.py:156-158):
    * FPL sends numerics as strings; `""`, `"null"`, `"None"` → NULL. */
  def toDoubleOrNull(c: Column): Column =
    when(trim(c).isin("", "null", "None"), lit(null).cast("double"))
      .otherwise(c.cast("double"))

  /** Parse the latest bootstrap envelope (struct of three arrays).
    * Parse-failure gate = DQ.assertParsed on "j". */
  def parseBootstrap(latestEnvelope: DataFrame): DataFrame =
    latestEnvelope.select(
      col("snapshot_ts"), col("snapshot_date"), col("run_id"), col("source_url"),
      from_json(col("payload_json"), Schemas.bootstrap).as("j"),
    )

  private def provenance: Seq[Column] = Seq(
    col("snapshot_ts").as("source_snapshot_ts"),
    col("snapshot_date").as("source_snapshot_date"),
    col("run_id").as("source_run_id"),
  )

  /** silver.team (31_build_silver_dims.py:137-147). */
  def teams(parsed: DataFrame): DataFrame =
    parsed.select(col("snapshot_ts"), col("snapshot_date"), col("run_id"),
        explode(col("j.teams")).as("t"))
      .select(Seq(
        col("t.id").cast("int").as("team_id"),
        col("t.name").as("team_name"),
        col("t.short_name").as("team_short_name"),
        col("t.strength").cast("int").as("strength"),
        col("t.pulse_id").cast("int").as("pulse_id"),
      ) ++ provenance: _*)

  /** silver.player (31_build_silver_dims.py:163-189). now_cost stays in
    * integer tenths of £m with the derived double now_cost_million. */
  def players(parsed: DataFrame): DataFrame =
    parsed.select(col("snapshot_ts"), col("snapshot_date"), col("run_id"),
        explode(col("j.elements")).as("e"))
      .select(Seq(
        col("e.id").cast("int").as("player_id"),
        col("e.first_name").as("first_name"),
        col("e.second_name").as("second_name"),
        col("e.web_name").as("web_name"),
        col("e.team").cast("int").as("team_id"),
        col("e.element_type").cast("int").as("position_id"),
        col("e.status").as("status"),
        col("e.now_cost").cast("int").as("now_cost"),
        (col("e.now_cost").cast("double") / lit(10.0)).as("now_cost_million"),
        col("e.chance_of_playing_next_round").cast("int").as("chance_next_round"),
        col("e.chance_of_playing_this_round").cast("int").as("chance_this_round"),
        col("e.minutes").cast("int").as("minutes"),
        toDoubleOrNull(col("e.selected_by_percent")).as("selected_by_percent"),
        toDoubleOrNull(col("e.form")).as("form"),
        toDoubleOrNull(col("e.points_per_game")).as("points_per_game"),
        col("e.total_points").cast("int").as("total_points"),
        col("e.transfers_in_event").cast("int").as("transfers_in_event"),
        col("e.transfers_out_event").cast("int").as("transfers_out_event"),
        toDoubleOrNull(col("e.ep_next")).as("ep_next"),
        toDoubleOrNull(col("e.ep_this")).as("ep_this"),
        col("e.news").as("news"),
        to_timestamp(col("e.news_added")).as("news_added_ts"),
      ) ++ provenance: _*)

  /** silver.gameweek (31_build_silver_dims.py:200-217). */
  def gameweeks(parsed: DataFrame): DataFrame =
    parsed.select(col("snapshot_ts"), col("snapshot_date"), col("run_id"),
        explode(col("j.events")).as("g"))
      .select(Seq(
        col("g.id").cast("int").as("gameweek_id"),
        col("g.name").as("gameweek_name"),
        to_timestamp(col("g.deadline_time")).as("deadline_time_ts"),
        col("g.finished").cast("boolean").as("finished"),
        col("g.is_previous").cast("boolean").as("is_previous"),
        col("g.is_current").cast("boolean").as("is_current"),
        col("g.is_next").cast("boolean").as("is_next"),
        col("g.data_checked").cast("boolean").as("data_checked"),
        col("g.highest_score").cast("int").as("highest_score"),
        col("g.average_entry_score").cast("int").as("average_entry_score"),
        col("g.most_selected").cast("int").as("most_selected_player_id"),
        col("g.most_transferred_in").cast("int").as("most_transferred_in_player_id"),
        col("g.top_element").cast("int").as("top_element_player_id"),
      ) ++ provenance: _*)

  /** Parse the fixtures envelope (bare array of structs,
    * 31_build_silver_dims.py:240-250). */
  def parseFixtures(latestEnvelope: DataFrame): DataFrame =
    latestEnvelope.select(
      col("snapshot_ts"), col("snapshot_date"), col("run_id"), col("source_url"),
      from_json(col("payload_json"), Schemas.fixturesPayload).as("fx"),
    )

  /** silver.fixture (31_build_silver_dims.py:255-272), with the
    * dropDuplicates(fixture_id) the reference applies. */
  def fixtures(parsedFx: DataFrame): DataFrame =
    parsedFx.select(col("snapshot_ts"), col("snapshot_date"), col("run_id"),
        explode(col("fx")).as("f"))
      .select(Seq(
        col("f.id").cast("int").as("fixture_id"),
        col("f.event").cast("int").as("gameweek_id"),
        to_timestamp(col("f.kickoff_time")).as("kickoff_ts"),
        col("f.team_h").cast("int").as("team_h_id"),
        col("f.team_a").cast("int").as("team_a_id"),
        col("f.team_h_difficulty").cast("int").as("team_h_difficulty"),
        col("f.team_a_difficulty").cast("int").as("team_a_difficulty"),
        col("f.finished").cast("boolean").as("finished"),
        col("f.started").cast("boolean").as("started"),
        col("f.provisional_start_time").cast("boolean").as("provisional_start_time"),
        col("f.minutes").cast("int").as("minutes"),
        col("f.code").cast("bigint").as("fixture_code"),
      ) ++ provenance: _*)
      .dropDuplicates("fixture_id")

  /** Run all silver DQ gates (31_build_silver_dims.py:296-306). */
  def assertSilverDq(teams: DataFrame, players: DataFrame,
                     gameweeks: DataFrame, fixtures: DataFrame): Unit = {
    DQ.assertPk(teams, "team_id", "silver.team")
    DQ.assertPk(players, "player_id", "silver.player")
    DQ.assertPk(gameweeks, "gameweek_id", "silver.gameweek")
    DQ.assertPk(fixtures, "fixture_id", "silver.fixture")
  }
}
