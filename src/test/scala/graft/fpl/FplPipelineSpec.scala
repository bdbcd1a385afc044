package graft.fpl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end spec of the reference's slice_v1 DAG re-expression: bronze
  * ingest → silver dims → gold dims → horizon fact (SURVEY.md §3 E1). */
class FplPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("toDoubleOrNull preserves the reference's quirky coercion") {
    val out = Seq("", "null", "None", " 4.5 ", "7").toDF("s")
      .select(Silver.toDoubleOrNull($"s").as("d"))
      .as[Option[Double]].collect().toSeq
    assert(out === Seq(None, None, None, Some(4.5), Some(7.0)))
  }

  private def env(json: String, url: String) = Bronze.envelope(
    Bronze.payloadRows(spark, Seq(
      (java.sql.Timestamp.valueOf("2025-08-12 06:15:00"), url, 200, json))),
    runId = "r1")

  test("silver builders parse synthetic bootstrap with correct schema and DQ") {
    val env0 = env(SampleData.bootstrapJson(), "test://bootstrap")
    val parsed = Silver.parseBootstrap(env0)
    DQ.assertParsed(parsed, "j", "bootstrap")
    val teams = Silver.teams(parsed)
    val players = Silver.players(parsed)
    val gws = Silver.gameweeks(parsed)
    assert(teams.count() === 4)
    assert(players.count() === 12)
    assert(gws.count() === 8)
    // string-numeric coercion applied: "" / "null" / "None" -> null
    assert(players.filter($"selected_by_percent".isNull).count() > 0)
    // money scaling: now_cost_million = now_cost / 10.0
    val p = players.select($"now_cost", $"now_cost_million")
      .as[(Int, Double)].collect()
    p.foreach { case (c, m) => assert(math.abs(m - c / 10.0) < 1e-12) }
  }

  test("full slice_v1 pipeline produces the top-20 horizon view, rerun-safe") {
    val wh = tmpDir("fpl-wh-")
    val pipeline = new Pipeline(spark, wh)
    val out1 = pipeline.runSliceV1()
    assert(out1.count() > 0)
    val cols = out1.columns.toSet
    assert(Set("player_id", "team_id", "h3_avg_fdr", "h5_avg_fdr",
      "h8_avg_fdr").subsetOf(cols), s"missing cols in $cols")
    // rerun: dup-payload guard skips re-append; results unchanged
    val out2 = pipeline.runSliceV1()
    assert(out2.collect().toSet === out1.collect().toSet)
  }

  test("fixtures builder dedups and drops unscheduled fixtures downstream") {
    val fx = Silver.fixtures(Silver.parseFixtures(
      env(SampleData.fixturesJson(), "test://fixtures")))
    DQ.assertPk(fx, "fixture_id", "silver.fixture")
    // one fixture has null gameweek (unscheduled)
    assert(fx.filter($"gameweek_id".isNull).count() === 1)
  }
}
