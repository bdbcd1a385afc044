package graft.ml

import graft.SparkSpec

class PointsSpec extends SparkSpec {
  import spark.implicits._

  private def pg = Seq(
    // (player, team, gw, minutes, points)
    (1, 10, 1, 90, 6), (1, 10, 2, 90, 2), (1, 10, 3, 45, 0),
    (1, 10, 4, 90, 10), (1, 10, 5, 0, 0),
    (2, 11, 1, 30, 1), (2, 11, 2, 60, 3),
  ).toDF("player_id", "team_id", "gameweek_id", "minutes", "points")

  private def price = Seq((1, 55), (2, 40))
    .toDF("player_id", "now_cost_tenths_million")

  private def fdr = Seq((10, 1, 2), (10, 2, 3), (10, 3, 2), (10, 4, 4),
    (10, 5, 2), (11, 1, 5), (11, 2, 3))
    .toDF("team_id", "gameweek_id", "difficulty")

  test("features: rolling form, minutes risk, and next-3 target are exact") {
    val f = Points.features(pg, price, fdr, formWindow = 3)
      .select("player_id", "gameweek_id", "form_score", "minutes_risk",
        "target_points_next_3_gws")
      .as[(Int, Int, Double, Double, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // player 1 gw1: form = 6 (1 row), risk = 0, target = 2+0+10 = 12
    assert(f((1, 1)) === ((6.0, 0.0, 12L)))
    // player 1 gw2: form = (6+2)/2 = 4, target = 0+10+0 = 10
    assert(f((1, 2)) === ((4.0, 0.0, 10L)))
    // player 1 gw3: form = (6+2+0)/3, risk = 1 - min((90+90+45)/3/90, 1) = 1/6
    val (form3, risk3, t3) = f((1, 3))
    assert(math.abs(form3 - 8.0 / 3) < 1e-12)
    assert(math.abs(risk3 - 1.0 / 6) < 1e-12)
    assert(t3 === 10L)
    // last gameweek per player has no following rows -> filtered out
    assert(!f.contains((1, 5)) && !f.contains((2, 2)))
  }

  test("features joins price and fixture difficulty") {
    val f = Points.features(pg, price, fdr)
      .select("player_id", "gameweek_id", "now_cost_tenths_million",
        "fixture_difficulty")
      .as[(Int, Int, Int, Double)].collect()
    f.foreach { case (p, gw, cost, d) =>
      assert(cost === (if (p == 1) 55 else 40))
      val expected = Map((10, 1) -> 2.0, (10, 2) -> 3.0, (10, 3) -> 2.0,
        (10, 4) -> 4.0, (11, 1) -> 5.0)
      assert(d === expected((if (p == 1) 10 else 11, gw)))
    }
  }

  test("GBT training is deterministic under a seed and returns sane metrics") {
    // larger synthetic frame so the 0.8/0.2 split trains
    val n = 300
    val synth = (0 until n).map { i =>
      val form = (i % 7).toDouble
      (i % 30, i % 5, i / 30 + 1, 90, i % 7,
        form, 0.1, 50, 3.0, (form * 3 + (i % 3)).toLong)
    }.toDF("player_id", "team_id", "gameweek_id", "minutes", "points",
      "form_score", "minutes_risk", "now_cost_tenths_million",
      "fixture_difficulty", "target_points_next_3_gws")
    val t1 = Points.trainGBT(synth)
    val t2 = Points.trainGBT(synth)
    assert(t1.rmse === t2.rmse)
    assert(t1.nTrain + t1.nTest === n)
    // the target is mostly 3*form -> the model must beat the mean baseline
    assert(t1.r2 > 0.5, s"r2 was ${t1.r2}")
  }

  test("logRun: two runs -> two versions, replay -> no-op, history is time-travelable") {
    val synth = (0 until 200).map { i =>
      val form = (i % 7).toDouble
      (i % 30, i % 5, i / 30 + 1, 90, i % 7,
        form, 0.1, 50, 3.0, (form * 3 + (i % 3)).toLong)
    }.toDF("player_id", "team_id", "gameweek_id", "minutes", "points",
      "form_score", "minutes_risk", "now_cost_tenths_million",
      "fixture_difficulty", "target_points_next_3_gws")
    val runs = graft.tables.VersionedTable(spark, tmpDir("ml-runs-") + "/runs")
    val t1 = Points.trainGBT(synth, seed = 42L, maxIter = 2)
    val t2 = Points.trainGBT(synth, seed = 7L, maxIter = 3)
    val v1 = Points.logRun(runs, t1, seed = 42L, maxIter = 2)
    val v2 = Points.logRun(runs, t2, seed = 7L, maxIter = 3)
    assert(v2.version === v1.version + 1)
    // replaying run 1 must be a ledger no-op: same version, same rows
    val v3 = Points.logRun(runs, t1, seed = 42L, maxIter = 2)
    assert(v3.version === v2.version)
    assert(runs.read.count() === 2)
    val byIter = runs.read
      .select("run_id", "max_iter", "num_trees", "rmse")
      .as[(String, Long, Long, Double)].collect().sortBy(_._2)
    assert(byIter.map(_._2).toSeq === Seq(2L, 3L))
    assert(byIter.map(_._3).toSeq === Seq(2L, 3L)) // num_trees == maxIter
    assert(byIter(0)._1 === Points.runId(42L, 2, 4))
    assert(byIter(0)._4 === t1.rmse)
    // the run history is versioned: v1 sees only the first run
    assert(runs.readVersion(v1.version).count() === 1)
  }

  test("logArtifact: the model binary persists, reloads bit-faithfully, " +
       "and re-logging the same run is a ledger no-op") {
    val synth = (0 until 200).map { i =>
      val form = (i % 7).toDouble
      (i % 30, i % 5, i / 30 + 1, 90, i % 7,
        form, 0.1, 50, 3.0, (form * 3 + (i % 3)).toLong)
    }.toDF("player_id", "team_id", "gameweek_id", "minutes", "points",
      "form_score", "minutes_risk", "now_cost_tenths_million",
      "fixture_difficulty", "target_points_next_3_gws")
    val root = tmpDir("ml-art-")
    val artifacts = graft.tables.VersionedTable(spark, s"$root/artifacts")
    val t1 = Points.trainGBT(synth, seed = 42L, maxIter = 2)
    val uri = Points.logArtifact(artifacts, s"$root/store", t1,
      seed = 42L, maxIter = 2)
    assert(uri.contains(Points.runId(42L, 2, 4)))
    val row = artifacts.read
      .select("run_id", "uri", "n_files", "total_bytes")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(row.map(_._1) === Seq(Points.runId(42L, 2, 4)))
    assert(row.head._3 > 0 && row.head._4 > 0,
      "the ledger row must carry the artifact's real file/byte counts")
    // reload and predict: the persisted forest IS the trained model
    val reloaded = Points.loadModel(artifacts, Points.runId(42L, 2, 4))
    val probe = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Points.FeatureCols).setOutputCol("features")
      .transform(synth)
    val want = t1.model.transform(probe).select("prediction")
      .as[Double].collect().toSeq
    val got = reloaded.transform(probe).select("prediction")
      .as[Double].collect().toSeq
    assert(got === want, "reloaded model must predict identically")
    // replay: same run id → overwrite of identical bytes + txn no-op
    val vBefore = artifacts.latestVersion.get
    Points.logArtifact(artifacts, s"$root/store", t1, seed = 42L, maxIter = 2)
    assert(artifacts.latestVersion.get === vBefore)
    assert(artifacts.read.count() === 1)
    // unknown run id fails loudly
    val e = intercept[IllegalArgumentException](
      Points.loadModel(artifacts, "deadbeef"))
    assert(e.getMessage.contains("no logged artifact"))
  }
}
