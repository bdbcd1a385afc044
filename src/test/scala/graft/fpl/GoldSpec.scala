package graft.fpl

import graft.SparkSpec
import java.sql.{Date, Timestamp}

class GoldSpec extends SparkSpec {
  import spark.implicits._

  private val d0 = Date.valueOf("2025-08-12")
  private val t0 = Timestamp.valueOf("2025-08-12 06:15:00")

  private def dimPlayer = Seq(
    // (player, team, position, cost, ep_next, web, sel, form, status)
    (1, 1, 1, 50, 2.0, "A", 10.0, 1.0, "a"),
    (2, 1, 2, 60, 3.0, "B", 11.0, 2.0, "a"),
    (3, 2, 2, 55, 5.0, "C", 12.0, 3.0, "a"),
    (4, 2, 2, 80, 9.0, "D", 13.0, 4.0, "a"),
    (5, 3, 2, 62, 6.5, "E", 14.0, 5.0, "i"),
  ).toDF("player_id", "team_id", "position_id", "now_cost", "ep_next",
    "web_name", "selected_by_percent", "form", "status")

  test("recommendTransfer obeys budget, position, and team-limit constraints") {
    // squad = {1, 2}; bank 5 tenths. Out candidates: 1 (pos 1), 2 (pos 2).
    // For out=2 (cost 60, bank 5 -> max 65): candidates pos 2 not in squad:
    // 3 (55 ok), 4 (80 too dear), 5 (62 ok). Best delta: 5 -> 6.5-3 = 3.5.
    val rec = Gold.recommendTransfer(dimPlayer, Seq(1, 2), bankTenths = 5)
      .as[(Int, String, Int, String, Double, Int)].collect()
    assert(rec.length === 1)
    val (outId, _, inId, _, delta, costDelta) = rec.head
    assert((outId, inId) === ((2, 5)))
    assert(math.abs(delta - 3.5) < 1e-12)
    assert(costDelta === 2)
  }

  test("recommendTransfer enforces max 3 per team after the swap") {
    // squad already has 3 players of team 2 -> cannot buy a 4th from team 2,
    // unless selling one of team 2 frees a slot
    val players = Seq(
      (1, 2, 1, 50, 2.0, "A", 0.0, 0.0, "a"),
      (2, 2, 1, 50, 2.0, "B", 0.0, 0.0, "a"),
      (3, 2, 1, 50, 2.0, "C", 0.0, 0.0, "a"),
      (4, 1, 1, 50, 1.0, "D", 0.0, 0.0, "a"),
      (9, 2, 1, 50, 99.0, "E", 0.0, 0.0, "a"), // team-2 superstar
    ).toDF("player_id", "team_id", "position_id", "now_cost", "ep_next",
      "web_name", "selected_by_percent", "form", "status")
    val rec = Gold.recommendTransfer(players, Seq(1, 2, 3, 4), 100)
      .as[(Int, String, Int, String, Double, Int)].collect()
    // buying 9 (team 2) is only legal when selling a team-2 player
    assert(rec.head._3 === 9)
    assert(Seq(1, 2, 3).contains(rec.head._1))
  }

  test("factPriceSnapshot + priceDeltas compute per-player cost changes") {
    val day1 = Gold.factPriceSnapshot(dimPlayer, d0, t0)
    assert(day1.columns.toSeq === Seq("snapshot_date", "player_id",
      "now_cost_tenths_million", "selected_by_percent", "form", "status",
      "updated_at"))
    val day2 = Gold.factPriceSnapshot(
      dimPlayer.withColumn("now_cost", $"now_cost" + ($"player_id" % 2)),
      Date.valueOf("2025-08-13"), t0)
    val deltas = Gold.priceDeltas(day1.unionByName(day2))
      .filter($"cost_delta_tenths".isNotNull)
      .select("player_id", "cost_delta_tenths")
      .as[(Int, Int)].collect().toMap
    assert(deltas === Map(1 -> 1, 2 -> 0, 3 -> 1, 4 -> 0, 5 -> 1))
  }

  test("factPlayerGameweek aggregates to the player×gameweek grain") {
    val history = Seq(
      (1, 10, 1, 45, 2), (1, 10, 1, 45, 4), (1, 10, 2, 90, 6),
    ).toDF("player_id", "team_id", "gameweek_id", "minutes", "points")
    val pg = Gold.factPlayerGameweek(history, t0)
      .select("player_id", "gameweek_id", "minutes", "points")
      .as[(Int, Int, Int, Int)].collect().toSet
    assert(pg === Set((1, 1, 90, 6), (1, 2, 90, 6)))
  }

  test("factLiveForm: rolling form and minutes risk per player") {
    val pg = Seq(
      (1, 10, 1, 90, 6), (1, 10, 2, 0, 0),
    ).toDF("player_id", "team_id", "gameweek_id", "minutes", "points")
      .withColumn("updated_at", org.apache.spark.sql.functions.lit(t0))
    val lf = Gold.factLiveForm(pg, windowGws = 2, d0, t0)
      .select("fixture_window", "form_score", "minutes_risk")
      .as[(String, Double, Double)].collect().sortBy(_._1)
    assert(lf(0) === (("last_2_gws@gw1", 6.0, 0.0)))
    assert(lf(1)._2 === 3.0) // (6+0)/2
    assert(math.abs(lf(1)._3 - 0.5) < 1e-12) // 1 - (90+0)/2/90
  }

  test("factTransferRecommendation emits the declared product row") {
    val row = Gold.factTransferRecommendation(dimPlayer, Seq(1, 2), 5,
      "run-1", d0, t0)
    assert(row.columns.toSeq === Seq("run_id", "snapshot_date",
      "out_player_id", "in_player_id", "expected_points_delta",
      "cost_delta_tenths_million", "constraint_flags", "rationale",
      "created_at"))
    val r = row.collect().head
    assert(r.getAs[String]("rationale").contains("swap B -> E"))
  }
}
