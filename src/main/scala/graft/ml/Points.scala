package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{GBTRegressionModel, GBTRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML slice: points-prediction feature pipeline + GBT baseline model.
  *
  * Declared by the reference (all notebooks empty): feature materialization
  * joining dims + price snapshots + fixture difficulty + live form with
  * target `predicted_points_next_3_gws` (docs/backlog.md:84-93,
  * docs/architecture.md:149-155 — "GBT or similar; interpretable
  * baseline"). MLflow tracking is out of scope offline; metrics come back
  * as a one-row DataFrame instead.
  *
  * Scale notes: the feature build is window functions over the
  * player×gameweek grain (one shuffle on player_id) plus broadcast joins
  * against small dims; GBT training on Spark ML is data-parallel over the
  * feature matrix.
  */
object Points {

  /** ML1: training frame at the player×gameweek grain.
    *
    * Features: rolling form (last `formWindow` gws), minutes risk, price,
    * team fixture-difficulty for the gameweek; target: points over the
    * NEXT 3 gameweeks (lead-sum window).
    *
    * Inputs: `playerGameweek` (player_id, team_id, gameweek_id, minutes,
    * points), `priceSnapshot` (player_id, now_cost_tenths_million, ...),
    * `teamGwDifficulty` (team_id, gameweek_id, difficulty). */
  def features(playerGameweek: DataFrame, priceSnapshot: DataFrame,
               teamGwDifficulty: DataFrame, formWindow: Int = 3): DataFrame = {
    val byPlayer = Window.partitionBy("player_id").orderBy(col("gameweek_id").asc)
    val form = byPlayer.rowsBetween(-(formWindow - 1), Window.currentRow)
    val next3 = byPlayer.rowsBetween(1, 3)
    playerGameweek
      .withColumn("form_score", avg(col("points")).over(form))
      .withColumn("minutes_risk",
        lit(1.0) - least(avg(col("minutes")).over(form) / lit(90.0), lit(1.0)))
      .withColumn("target_points_next_3_gws", sum(col("points")).over(next3))
      .join(priceSnapshot.select(col("player_id"),
        col("now_cost_tenths_million")), Seq("player_id"), "left")
      .join(broadcast(teamGwDifficulty
          .groupBy("team_id", "gameweek_id")
          .agg(avg(col("difficulty")).as("fixture_difficulty"))),
        Seq("team_id", "gameweek_id"), "left")
      .na.fill(0.0, Seq("form_score", "minutes_risk", "fixture_difficulty"))
      .na.fill(0, Seq("now_cost_tenths_million"))
      .filter(col("target_points_next_3_gws").isNotNull)
      .select("player_id", "team_id", "gameweek_id", "minutes", "points",
        "form_score", "minutes_risk", "now_cost_tenths_million",
        "fixture_difficulty", "target_points_next_3_gws")
  }

  val FeatureCols: Array[String] = Array("form_score", "minutes_risk",
    "now_cost_tenths_million", "fixture_difficulty", "minutes", "points")

  final case class Trained(model: GBTRegressionModel, rmse: Double,
                           r2: Double, nTrain: Long, nTest: Long)

  /** ML2: GBT points model — interpretable baseline regressor
    * (docs/backlog.md:90-93). Deterministic under `seed`. */
  def trainGBT(featureFrame: DataFrame, seed: Long = 42L,
               maxIter: Int = 20): Trained = {
    // cache the assembled features: fit + transform + two evaluator
    // passes + two counts would otherwise each recompute the full
    // window/join feature pipeline
    val raw = new VectorAssembler()
      .setInputCols(FeatureCols).setOutputCol("features")
      .transform(featureFrame)
      .withColumnRenamed("target_points_next_3_gws", "label")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // GBT runs many small jobs per boosting iteration; right-size the
    // partition count to the data (~25k rows/partition) so tiny inputs
    // aren't task-scheduling-bound across the full parallelism — a
    // sub-25k frame runs every per-iteration job as ONE task
    val n = raw.count()
    val parts = math.max(1, math.min((n / 25000L).toInt + 1,
      raw.rdd.getNumPartitions))
    val assembled =
      if (parts < raw.rdd.getNumPartitions) {
        val c = raw.coalesce(parts)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.count(); raw.unpersist(); c
      } else raw
    try {
      val Array(train, test) = assembled.randomSplit(Array(0.8, 0.2), seed)
      val model = new GBTRegressor()
        .setLabelCol("label").setFeaturesCol("features")
        .setMaxIter(maxIter).setMaxDepth(4).setSeed(seed)
        .fit(train)
      // ONE aggregation pass for every metric. The evaluator route cost
      // FOUR jobs per fit (rmse pass, r2 pass, train.count, test.count)
      // — on a small feature frame the fit's wall time is job-scheduling
      // overhead, and a lifecycle query that trains twice paid 8 metric
      // jobs. rmse = sqrt(SSres/n); r2 = 1 − SSres/SStot with
      // SStot = Σy² − n·ȳ² (RegressionEvaluator's summary formula);
      // nTrain = n − nTest exactly (randomSplit partitions rows).
      val m = model.transform(test)
        .agg(count(lit(1)).as("n"),
          sum(pow(col("label").cast("double") - col("prediction"), 2))
            .as("ssres"),
          sum(col("label").cast("double")).as("sy"),
          sum(pow(col("label").cast("double"), 2)).as("syy"))
        .head()
      val nTest = m.getLong(0)
      // degenerate splits keep the evaluator's contract: an empty test
      // set, a non-empty one whose labels/predictions are all NULL
      // (the sums stay NULL while n > 0), or zero label variance
      // yields NaN metrics, never an NPE or Infinity
      if (nTest == 0 || (1 to 3).exists(m.isNullAt))
        Trained(model, Double.NaN, Double.NaN, n - nTest, nTest)
      else {
        val ssres = m.getDouble(1)
        val ssTot = m.getDouble(3) - m.getDouble(2) * m.getDouble(2) / nTest
        Trained(model, math.sqrt(ssres / nTest),
          if (ssTot == 0.0) Double.NaN else 1.0 - ssres / ssTot,
          n - nTest, nTest)
      }
    } finally assembled.unpersist()
  }

  /** Metrics as a one-row DataFrame (the offline stand-in for MLflow run
    * logging). */
  def metricsRow(spark: org.apache.spark.sql.SparkSession,
                 t: Trained): DataFrame = {
    import spark.implicits._
    Seq((t.rmse, t.r2, t.nTrain, t.nTest,
      t.model.getNumTrees.toLong, t.model.getMaxDepth.toLong))
      .toDF("rmse", "r2", "n_train", "n_test", "num_trees", "depth")
  }

  /** Content-derived run id: md5 of the canonical param string. The same
    * params always yield the same run_id, which is what makes re-logging a
    * run a REPLAY (idempotent no-op) rather than a duplicate row — and the
    * derivation is plain md5-of-string so an external auditor (or the
    * DuckDB oracle) can recompute it. */
  def runId(seed: Long, maxIter: Int, maxDepth: Int): String = {
    val canonical = s"gbt_points|seed=$seed|max_iter=$maxIter|max_depth=$maxDepth"
    java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }

  /** MLflow-style run tracking against a versioned table
    * (docs/backlog.md:90-93 "Track params + metrics with MLflow" — the
    * offline constraint excuses MLflow itself, not the tracking
    * semantics): appends ONE (run_id, params, metrics) row per
    * [[trainGBT]] call, rerun-idempotent via the table's txn ledger keyed
    * by the content-derived [[runId]] — replaying the same run (same
    * params) is a no-op, a new param set is a new table version, and time
    * travel over the table is the run history. */
  def logRun(table: graft.tables.VersionedTable, t: Trained,
             seed: Long, maxIter: Int): graft.tables.VersionedTable.LogEntry = {
    val spark = table.spark
    import spark.implicits._
    val id = runId(seed, maxIter, t.model.getMaxDepth)
    val row = Seq((id, seed, maxIter.toLong, t.model.getMaxDepth.toLong,
        t.model.getNumTrees.toLong, t.rmse, t.r2, t.nTrain, t.nTest))
      .toDF("run_id", "seed", "max_iter", "depth", "num_trees",
        "rmse", "r2", "n_train", "n_test")
    table.append(row, txn = Some((s"gbt_points/$id", 0L)))
  }

  /** MLflow-style ARTIFACT logging (docs/backlog.md:92 "Log … model
    * artifacts" — the half [[logRun]]'s metrics/params rows didn't
    * cover): the trained model persists under
    * `<artifactRoot>/<run_id>/model` in Spark ML's own writable format
    * (a small parquet forest — loadable by `GBTRegressionModel.load` on
    * any cluster, no driver-side serialization of the model object),
    * and ONE `(run_id, uri, n_files, total_bytes)` row lands in the
    * artifacts table. Idempotent like the run row: the save is an
    * overwrite of content derived purely from (params, training data),
    * and the append is txn-marked by the content-derived run id, so
    * re-logging the same run replays as a metadata no-op — the MLflow
    * tracking-server contract (artifact store holds the bytes, the
    * ledger holds the URI). Returns the artifact URI. */
  def logArtifact(artifacts: graft.tables.VersionedTable,
                  artifactRoot: String, t: Trained,
                  seed: Long, maxIter: Int): String = {
    val spark = artifacts.spark
    import spark.implicits._
    val id = runId(seed, maxIter, t.model.getMaxDepth)
    val dir = s"$artifactRoot/$id/model"
    t.model.write.overwrite().save(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(p, true)
    var files = 0L
    var bytes = 0L
    while (it.hasNext) { val f = it.next(); files += 1; bytes += f.getLen }
    val row = Seq((id, dir, files, bytes))
      .toDF("run_id", "uri", "n_files", "total_bytes")
    artifacts.append(row, txn = Some((s"gbt_points_artifact/$id", 0L)))
    dir
  }

  /** Reload a logged model by run id — the artifacts table resolves the
    * URI, Spark ML loads the forest. */
  def loadModel(artifacts: graft.tables.VersionedTable,
                runId: String): GBTRegressionModel = {
    val rows = artifacts.read.filter(col("run_id") === runId)
      .select("uri").limit(1).collect()
    require(rows.nonEmpty, s"no logged artifact for run $runId")
    GBTRegressionModel.load(rows.head.getString(0))
  }
}
