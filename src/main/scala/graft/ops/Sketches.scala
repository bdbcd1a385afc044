package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.VersionedTable

/** Mergeable distinct-count sketch rollups — the incremental answer to
  * `COUNT(DISTINCT x)`, the one aggregate no exact MV can maintain
  * (a distinct count is not a sum of per-slice distinct counts).
  *
  * The rollup table stores, per group, an exact row count and a
  * Datasketches HLL sketch (Spark's `hll_sketch_agg`, a BINARY column,
  * ~2^lgK registers ≈ KB-scale). Sketches form a monoid under
  * `hll_union`: register-wise max, associative and commutative — so
  * an append-only slice aggregates to PARTIAL sketches map-side and
  * merges into the stored rollup without touching history, and a
  * union of partial sketches holds exactly the same registers as one
  * sketch built over all the data (identical estimates, not merely
  * close). That is what makes this the 100 TB shape: per refresh the
  * engine reads O(appended rows), shuffles group-count×KB of sketch
  * bytes, and bucket-COW-merges the touched groups.
  *
  * Deletes cannot retract an HLL register, so a slice with retractions
  * falls back to a full rebuild — same policy and the same loud
  * visibility as the exact-MV machinery's `"full"` mode.
  *
  * Estimates are approximate (±~1.6%/√2^lgK); the EXACT `n_rows`
  * companion rides along both as a freshness witness and because a
  * per-group exact row count is free in the same pass.
  */
object Sketches {

  val SourceProp = "graft.sketch.source"
  val GroupProp = "graft.sketch.group"
  val DistinctProp = "graft.sketch.distinct"
  val LgkProp = "graft.sketch.lgk"
  val VersionProp = "graft.sketch.sourceVersion"
  /** Bumped on every [[create]] — namespaces the txn ledger so markers
    * from a replaced definition era (possibly covering a DIFFERENT
    * source at a higher version) are never consulted. Without it, a
    * re-created rollup resumed from the old era's marker and could
    * read as permanently fresh against a source that never reaches
    * that version. */
  val EpochProp = "graft.sketch.epoch"
  private val TxnApp = "graft-sketch:"

  /** One-shot rollup: per group, exact row count + HLL sketch of
    * `distinctCol`. */
  def rollup(df: DataFrame, groupCols: Seq[String], distinctCol: String,
             lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        call_function("hll_sketch_agg", col(distinctCol), lit(lgK))
          .as("distinct_sketch"))

  /** The rollup with estimates resolved — what a reader consumes. */
  def withEstimate(rollup: DataFrame): DataFrame =
    rollup.withColumn("approx_distinct",
      call_function("hll_sketch_estimate", col("distinct_sketch")))

  /** Materialize the rollup of `src` into `mv` at the current snapshot
    * and persist the definition for [[refresh]]. */
  def create(src: VersionedTable, mv: VersionedTable,
             groupCols: Seq[String], distinctCol: String,
             lgK: Int = 12): Unit = {
    val v = src.latestVersion.getOrElse(
      sys.error(s"sketch rollup: empty table at ${src.root}"))
    // a REPLACE with a different group set must not inherit the old
    // definition's merge bucketing (the overwrite would try to bucket
    // by a column the new rollup lacks), and a replaced MV/join-MV
    // definition's properties must go, or two refreshers would claim
    // the table — the same discipline as JoinMv.create
    if (mv.exists) {
      mv.clearBucketSpec()
      mv.unsetProperties(Seq(
        graft.tables.GraftSql.MvSourceProp, graft.tables.GraftSql.MvGroupProp,
        graft.tables.GraftSql.MvAggsProp, graft.tables.GraftSql.MvVersionProp,
        graft.tables.GraftSql.MvWhereProp,
        graft.plans.JoinMv.FactProp, graft.plans.JoinMv.DimProp,
        graft.plans.JoinMv.KeysProp, graft.plans.JoinMv.GroupProp,
        graft.plans.JoinMv.AggsProp, graft.plans.JoinMv.FactVersionProp,
        graft.plans.JoinMv.DimVersionProp))
    }
    mv.overwrite(rollup(src.readVersion(v), groupCols, distinctCol, lgK))
    val epoch = mv.properties.get(EpochProp)
      .flatMap(e => scala.util.Try(e.toLong).toOption).getOrElse(-1L) + 1
    mv.setProperties(Map(
      SourceProp -> src.root, GroupProp -> groupCols.mkString(","),
      DistinctProp -> distinctCol, LgkProp -> lgK.toString,
      VersionProp -> v.toString, EpochProp -> epoch.toString))
  }

  /** Catch the rollup up with its source. Append-only tails absorb as
    * partial-sketch merges (`"incremental"` — O(appended rows));
    * retractions rebuild (`"full"`); nothing new is `"noop"`. Crash
    * replays are txn-ledger no-ops like every other maintenance merge. */
  def refresh(spark: SparkSession, mv: VersionedTable): String = {
    val props = mv.properties
    val src = VersionedTable(spark, props.getOrElse(SourceProp,
      sys.error(s"${mv.root} is not a sketch rollup (no $SourceProp)")))
    val groupCols = props(GroupProp).split(",").toSeq
    val distinctCol = props(DistinctProp)
    val lgK = props(LgkProp).toInt
    val txnApp = TxnApp + props.getOrElse(EpochProp, "0") + ":" + mv.root
    val v0Prop = props(VersionProp).toLong
    val v0 = math.max(v0Prop, mv.lastTxnVersion(txnApp).getOrElse(v0Prop))
    val hist = src.history
    val head = hist.lastOption.map(_.version).getOrElse(v0)
    val later = hist.filter(e => e.version > v0 && e.version <= head)
    val absorbless = graft.tables.GraftSql.AbsorblessActions
    def finish(mode: String): String = {
      if (head > v0Prop)
        mv.setProperties(Map(VersionProp -> head.toString))
      mode
    }
    def incremental(): Option[String] = {
      // persisted: the NULL-key probe and the merge share the one
      // aggregation pass (the delta is group-count-sized)
      val delta = rollup(src.readAddedBetween(v0, head), groupCols,
        distinctCol, lgK)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // NULL group values cannot ride the merge (SQL MERGE: NULL
        // never matches — every refresh would INSERT a fresh NULL row,
        // splitting the group's count and sketch across duplicates)
        if (graft.tables.GraftSql.hasNullKeys(delta, groupCols)) None
        else {
          mv.merge(delta, groupCols, updateExprs = Map(
            "n_rows" -> ((t: Column, u: Column) => t + u),
            // register-wise max: the union sketch is EXACTLY the sketch
            // a full rebuild would produce
            "distinct_sketch" -> ((t: Column, u: Column) =>
              call_function("hll_union", t, u))),
            txn = Some((txnApp, head)))
          Some(finish("incremental"))
        }
      } finally { delta.unpersist(); () }
    }
    if (later.isEmpty || later.forall(e => absorbless(e.action)))
      finish("noop")
    else if (later.forall(e =>
        e.action == "append" || absorbless(e.action)) &&
        src.addedSetsLive(v0, head) && incremental().isDefined)
      "incremental"
    else {
      mv.overwrite(rollup(src.readVersion(head), groupCols,
        distinctCol, lgK))
      finish("full")
    }
  }

  // ---------------------------------------------------------------------
  // Frequency rollups: count-min sketches + candidate heavy hitters
  // ---------------------------------------------------------------------

  val FreqSourceProp = "graft.cms.source"
  val FreqGroupProp = "graft.cms.group"
  val FreqItemProp = "graft.cms.item"
  val FreqParamsProp = "graft.cms.params" // "eps,confidence,seed,topM"
  val FreqVersionProp = "graft.cms.sourceVersion"
  val FreqEpochProp = "graft.cms.epoch"
  private val FreqTxnApp = "graft-cms:"

  /** How many candidate items a rollup may carry per group before the
    * refresh prunes them back to the estimate-ranked top `topM`. */
  private def candidateCap(topM: Int): Int = 4 * topM

  /** One-shot frequency rollup: per group, an exact row count, a
    * count-min sketch of `itemCol` (mergeable: counter-wise sums), and
    * the slice's EXACT top-`topM` items as the candidate set. A CMS
    * answers "how often did X occur" but cannot enumerate X — the
    * candidate set is the enumeration half of the heavy-hitter pair:
    * every item that was top-`topM` in at least one absorbed slice
    * stays queryable, and the sketch (an over-estimate, never under)
    * ranks the union. */
  def freqRollup(df: DataFrame, groupCols: Seq[String], itemCol: String,
                 eps: Double = 0.0005, confidence: Double = 0.99,
                 seed: Int = 42, topM: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.SketchFunctions.register(df.sparkSession)
    val gc = groupCols.map(col)
    val sketch = df.groupBy(gc: _*)
      .agg(count(lit(1)).as("n_rows"),
        call_function("count_min_sketch", col(itemCol), lit(eps),
          lit(confidence), lit(seed)).as("freq_sketch"))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("cnt").desc, col("item"))
    val cands = df.groupBy((gc :+ col(itemCol).as("item")): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topM)
      // struct-sorted so the array order is deterministic (count desc,
      // item asc) — merge unions re-rank by estimate anyway
      .groupBy(gc: _*)
      .agg(expr("transform(array_sort(collect_list(struct(-cnt AS nc, " +
        "item))), s -> s.item)").as("top_candidates"))
    sketch.join(cands, groupCols)
  }

  /** The heavy-hitter readout: per group, the candidate items ranked by
    * their sketch-estimated counts, top `k`. Estimates are CMS upper
    * bounds (≥ the true count; equal with high probability at the
    * default width). */
  def topFreqItems(rollup: DataFrame, groupCols: Seq[String],
                   k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.SketchFunctions.register(rollup.sparkSession)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("est_count").desc, col("item"))
    rollup
      .select(groupCols.map(col) :+ col("freq_sketch") :+
        explode(col("top_candidates")).as("item"): _*)
      .withColumn("est_count",
        call_function("graft_cms_estimate", col("freq_sketch"),
          col("item")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(groupCols.map(col) :+ col("item") :+ col("est_count") :+
        col("rank"): _*)
  }

  /** Materialize the frequency rollup of `src` into `mv` and persist
    * the definition for [[refreshFreq]]. */
  def createFreq(src: VersionedTable, mv: VersionedTable,
                 groupCols: Seq[String], itemCol: String,
                 eps: Double = 0.0005, confidence: Double = 0.99,
                 seed: Int = 42, topM: Int = 20): Unit = {
    val v = src.latestVersion.getOrElse(
      sys.error(s"frequency rollup: empty table at ${src.root}"))
    if (mv.exists) mv.clearBucketSpec()
    mv.overwrite(freqRollup(src.readVersion(v), groupCols, itemCol,
      eps, confidence, seed, topM))
    val epoch = mv.properties.get(FreqEpochProp)
      .flatMap(e => scala.util.Try(e.toLong).toOption).getOrElse(-1L) + 1
    mv.setProperties(Map(
      FreqSourceProp -> src.root, FreqGroupProp -> groupCols.mkString(","),
      FreqItemProp -> itemCol,
      FreqParamsProp -> s"$eps,$confidence,$seed,$topM",
      FreqVersionProp -> v.toString, FreqEpochProp -> epoch.toString))
  }

  /** Catch the frequency rollup up with its source. Append-only tails
    * absorb as counter-wise sketch sums plus a candidate-set union
    * (`"incremental"` — O(appended rows)); CMS counters cannot
    * retract, so slices with deletes rebuild (`"full"`). When a
    * group's candidate union outgrows 4×topM, it is pruned back to the
    * estimate-ranked topM in the same refresh — candidate state stays
    * O(groups × topM) forever. */
  def refreshFreq(spark: SparkSession, mv: VersionedTable): String = {
    graft.functions.SketchFunctions.register(spark)
    val props = mv.properties
    val src = VersionedTable(spark, props.getOrElse(FreqSourceProp,
      sys.error(s"${mv.root} is not a frequency rollup (no $FreqSourceProp)")))
    val groupCols = props(FreqGroupProp).split(",").toSeq
    val itemCol = props(FreqItemProp)
    val Array(eps, conf, seed, topM) = props(FreqParamsProp).split(",")
    val txnApp = FreqTxnApp + props.getOrElse(FreqEpochProp, "0") +
      ":" + mv.root
    val v0Prop = props(FreqVersionProp).toLong
    val v0 = math.max(v0Prop, mv.lastTxnVersion(txnApp).getOrElse(v0Prop))
    val hist = src.history
    val head = hist.lastOption.map(_.version).getOrElse(v0)
    val later = hist.filter(e => e.version > v0 && e.version <= head)
    val absorbless = graft.tables.GraftSql.AbsorblessActions
    def finish(mode: String): String = {
      if (head > v0Prop)
        mv.setProperties(Map(FreqVersionProp -> head.toString))
      mode
    }
    def incremental(): Option[String] = {
      val delta = freqRollup(src.readAddedBetween(v0, head), groupCols,
        itemCol, eps.toDouble, conf.toDouble, seed.toInt, topM.toInt)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        if (graft.tables.GraftSql.hasNullKeys(delta, groupCols)) None
        else {
          mv.merge(delta, groupCols, updateExprs = Map(
            "n_rows" -> ((t: Column, u: Column) => t + u),
            // counter-wise sum — merged counters EXACTLY equal a
            // rebuild's (CMS is a monoid under cell addition)
            "freq_sketch" -> ((t: Column, u: Column) => coalesce(
              call_function("graft_cms_merge", t, u), t, u)),
            // both sides are non-null by construction (freqRollup's
            // inner join yields candidates for every emitted group)
            "top_candidates" -> ((t: Column, u: Column) =>
              array_distinct(concat(t, u)))),
            txn = Some((txnApp, head)))
          pruneCandidates(mv, groupCols, topM.toInt, txnApp, head)
          Some(finish("incremental"))
        }
      } finally { delta.unpersist(); () }
    }
    if (later.isEmpty || later.forall(e => absorbless(e.action)))
      finish("noop")
    else if (later.forall(e =>
        e.action == "append" || absorbless(e.action)) &&
        src.addedSetsLive(v0, head) && incremental().isDefined)
      "incremental"
    else {
      mv.overwrite(freqRollup(src.readVersion(head), groupCols, itemCol,
        eps.toDouble, conf.toDouble, seed.toInt, topM.toInt))
      finish("full")
    }
  }

  /** Bounded candidate state: any group whose union exceeded the cap
    * re-ranks its candidates by sketch estimate and keeps topM. Rollup
    * tables are group-count-sized, so this probe is metadata-cheap;
    * the rewrite touches only oversized groups (bucket-COW). */
  private def pruneCandidates(mv: VersionedTable, groupCols: Seq[String],
                              topM: Int, txnApp: String,
                              head: Long): Unit = {
    val oversized = mv.read
      .filter(size(col("top_candidates")) > candidateCap(topM))
    if (!oversized.isEmpty) {
      val prunedArrays = topFreqItems(oversized, groupCols, topM)
        .groupBy(groupCols.map(col): _*)
        .agg(expr("transform(array_sort(collect_list(struct(rank, " +
          "item))), s -> s.item)").as("top_candidates"))
      // full-schema update rows: only top_candidates changes, the
      // sketch and count ride through untouched
      val pruned = oversized.drop("top_candidates")
        .join(prunedArrays, groupCols)
      mv.merge(pruned, groupCols, updateExprs = Map(
        "n_rows" -> ((t: Column, _: Column) => t),
        "freq_sketch" -> ((t: Column, _: Column) => t),
        "top_candidates" -> ((_: Column, u: Column) => u)),
        txn = Some((txnApp + ":prune", head)))
      ()
    }
  }
}
