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
  * Deletes cannot retract an HLL register — but when the source's
  * change feed is on, the feed names WHICH groups moved and only those
  * recompute from the pinned snapshot (`"groups"`, O(touched groups'
  * rows)); without the feed a retraction slice falls back to a full
  * rebuild (`"full"`), the exact-MV machinery's policy.
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

  /** Per-TOUCHED-group recompute+replace — the retraction path for
    * rollups whose state cannot subtract (HLL registers, CMS counters):
    * the change feed names WHICH groups moved; only those groups
    * re-aggregate from the pinned snapshot (`mkRollup` over a semi-join
    * — AQE broadcasts the touched-key set when small, so the source
    * never shuffles) and REPLACE-merge into the rollup; vanished groups
    * tombstone FIRST so the replace's txn marker drives crash resume
    * (the same ordering as GraftSql.mergeTouchedGroups, for the same
    * reason). O(touched groups' rows), never O(table). None = NULL
    * group keys in the slice (cannot merge) — the caller rebuilds. */
  private def touchedGroupsRefresh(mv: VersionedTable, feed: DataFrame,
      snapshot: DataFrame, mkRollup: DataFrame => DataFrame,
      replaceCols: Seq[String], groupCols: Seq[String],
      txnApp: String, head: Long): Option[Unit] = {
    val touched = feed.select(groupCols.map(col): _*).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one full-consumption probe that also materializes the persist
      val (nTouched, nNullKeys) =
        graft.tables.GraftSql.probeDelta(touched, groupCols)
      if (nTouched == 0L) Some(())
      else if (nNullKeys > 0L) None
      else {
        val fresh = mkRollup(
          snapshot.join(touched, groupCols, "left_semi"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val gone = touched.join(
            fresh.select(groupCols.map(col): _*), groupCols, "left_anti")
          if (!gone.isEmpty) {
            mv.merge(gone.withColumn(graft.ops.Merge.DeleteCol, lit(true)),
              groupCols, txn = Some((txnApp + ":del", head)))
            ()
          }
          mv.merge(fresh, groupCols, updateExprs = replaceCols.map(c =>
            c -> ((_: Column, u: Column) => u)).toMap,
            txn = Some((txnApp, head)))
          Some(())
        } finally { fresh.unpersist(); () }
      }
    } finally { touched.unpersist(); () }
  }

  /** Every maintained-rollup definition property across ALL families —
    * exact MVs, join MVs, HLL/CMS/quantile rollups. A table carries AT
    * MOST ONE live definition: each creator sweeps every OTHER family's
    * props (and its own, harmlessly re-set just after) so a REPLACE can
    * never leave two refreshers claiming the same table — otherwise
    * REFRESH MATERIALIZED VIEW dispatches on the stale definition
    * against the overwritten data. Epoch props deliberately survive:
    * they namespace each family's txn-marker ledger across re-creates,
    * and resetting one would let a later same-family re-create resume
    * from a dead era's markers. */
  private def definitionProps: Seq[String] = Seq(
    graft.tables.GraftSql.MvSourceProp, graft.tables.GraftSql.MvGroupProp,
    graft.tables.GraftSql.MvAggsProp, graft.tables.GraftSql.MvVersionProp,
    graft.tables.GraftSql.MvWhereProp,
    graft.plans.JoinMv.FactProp, graft.plans.JoinMv.DimProp,
    graft.plans.JoinMv.KeysProp, graft.plans.JoinMv.GroupProp,
    graft.plans.JoinMv.AggsProp, graft.plans.JoinMv.FactVersionProp,
    graft.plans.JoinMv.DimVersionProp, graft.plans.JoinMv.DimFilterProp,
    SourceProp, GroupProp, DistinctProp, LgkProp, VersionProp,
    FreqSourceProp, FreqGroupProp, FreqItemProp, FreqParamsProp,
    FreqVersionProp,
    QuantSourceProp, QuantGroupProp, QuantValueProp, QuantParamsProp,
    QuantVersionProp)

  /** Pre-REPLACE sweep shared by all rollup creators: drop the old
    * definition's merge bucketing (the overwrite would try to bucket by
    * a column the new rollup lacks) and every family's definition
    * props. */
  /** Deliberately fail-loud on a half-finished REPLACE: the sweep runs
    * BEFORE the new materialization, so a creator that throws mid-way
    * leaves the table with its old DATA but no definition — REFRESH then
    * errors ("not a … rollup") until the CREATE OR REPLACE is re-run,
    * which recovers cleanly (the sweep is idempotent). The alternative
    * orderings are both worse: sweeping AFTER the overwrite leaves the
    * OLD definition live on the NEW data (a stale refresher silently
    * corrupting the replacement — the round-11 bug this sweep fixed),
    * and restoring the saved definition on failure cannot also restore
    * the cleared bucket spec, leaving a definition whose merges would
    * mis-route. */
  private[graft] def clearReplacedDefinition(mv: VersionedTable): Unit =
    if (mv.exists) {
      mv.clearBucketSpec()
      mv.unsetProperties(definitionProps)
    }

  /** Materialize the rollup of `src` into `mv` at the current snapshot
    * and persist the definition for [[refresh]]. */
  def create(src: VersionedTable, mv: VersionedTable,
             groupCols: Seq[String], distinctCol: String,
             lgK: Int = 12): Unit = {
    val v = src.latestVersion.getOrElse(
      sys.error(s"sketch rollup: empty table at ${src.root}"))
    clearReplacedDefinition(mv)
    mv.overwrite(rollup(src.readVersion(v), groupCols, distinctCol, lgK))
    val epoch = mv.properties.get(EpochProp)
      .flatMap(e => scala.util.Try(e.toLong).toOption).getOrElse(-1L) + 1
    mv.setProperties(Map(
      SourceProp -> src.root, GroupProp -> groupCols.mkString(","),
      DistinctProp -> distinctCol, LgkProp -> lgK.toString,
      VersionProp -> v.toString, EpochProp -> epoch.toString))
    // retention floor on the source (same contract as the exact MV
    // families): vacuum must not reclaim the covered version or the
    // added/change sets the next refresh reads
    src.setPin(graft.plans.JoinMv.pinName(mv), v)
  }

  /** Catch the rollup up with its source. Append-only tails absorb as
    * partial-sketch merges (`"incremental"` — O(appended rows));
    * retractions recompute only the feed-named touched groups
    * (`"groups"`) when the change feed is on, and rebuild (`"full"`)
    * otherwise; nothing new is `"noop"`. Crash replays are txn-ledger
    * no-ops like every other maintenance merge. */
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
      if (hist.exists(_.version == head))
        src.setPin(graft.plans.JoinMv.pinName(mv), head)
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
        // splitting the group's count and sketch across duplicates).
        // Full-consumption probe so the persist actually materializes
        // before the merge plans on it (GraftSql.probeDelta).
        if (graft.tables.GraftSql.probeDelta(delta, groupCols)._2 > 0L) None
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
      // registers cannot retract, but the feed names WHICH groups
      // moved — recompute only those ("groups"), rebuild otherwise
      val groups: Option[String] =
        if (!src.changeFeedEnabled) None
        else try touchedGroupsRefresh(mv,
          src.readChangeFeed(v0, Some(head)), src.readVersion(head),
          d => rollup(d, groupCols, distinctCol, lgK),
          Seq("n_rows", "distinct_sketch"), groupCols, txnApp, head)
          .map(_ => finish("groups"))
        catch { case _: graft.tables.CdfNotExpressible => None }
      groups.getOrElse {
        mv.overwrite(rollup(src.readVersion(head), groupCols,
          distinctCol, lgK))
        finish("full")
      }
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
    clearReplacedDefinition(mv)
    mv.overwrite(freqRollup(src.readVersion(v), groupCols, itemCol,
      eps, confidence, seed, topM))
    val epoch = mv.properties.get(FreqEpochProp)
      .flatMap(e => scala.util.Try(e.toLong).toOption).getOrElse(-1L) + 1
    mv.setProperties(Map(
      FreqSourceProp -> src.root, FreqGroupProp -> groupCols.mkString(","),
      FreqItemProp -> itemCol,
      FreqParamsProp -> s"$eps,$confidence,$seed,$topM",
      FreqVersionProp -> v.toString, FreqEpochProp -> epoch.toString))
    // retention floor on the source (same contract as the exact MV
    // families): vacuum must not reclaim the covered version or the
    // added/change sets the next refresh reads
    src.setPin(graft.plans.JoinMv.pinName(mv), v)
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
      if (hist.exists(_.version == head))
        src.setPin(graft.plans.JoinMv.pinName(mv), head)
      mode
    }
    def incremental(): Option[String] = {
      val delta = freqRollup(src.readAddedBetween(v0, head), groupCols,
        itemCol, eps.toDouble, conf.toDouble, seed.toInt, topM.toInt)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // full-consumption probe: materializes the persist too
        if (graft.tables.GraftSql.probeDelta(delta, groupCols)._2 > 0L) None
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
      // counters cannot retract; recompute only the touched groups
      // when the feed can name them ("groups"), rebuild otherwise
      val groups: Option[String] =
        if (!src.changeFeedEnabled) None
        else try touchedGroupsRefresh(mv,
          src.readChangeFeed(v0, Some(head)), src.readVersion(head),
          d => freqRollup(d, groupCols, itemCol, eps.toDouble,
            conf.toDouble, seed.toInt, topM.toInt),
          Seq("n_rows", "freq_sketch", "top_candidates"), groupCols,
          txnApp, head)
          .map(_ => finish("groups"))
        catch { case _: graft.tables.CdfNotExpressible => None }
      groups.getOrElse {
        mv.overwrite(freqRollup(src.readVersion(head), groupCols, itemCol,
          eps.toDouble, conf.toDouble, seed.toInt, topM.toInt))
        finish("full")
      }
    }
  }

  // ---------------------------------------------------------------------
  // Quantile rollups: mergeable log2-octave histograms
  // ---------------------------------------------------------------------

  val QuantSourceProp = "graft.quant.source"
  val QuantGroupProp = "graft.quant.group"
  val QuantValueProp = "graft.quant.value"
  val QuantParamsProp = "graft.quant.params" // "scale,subBuckets"
  val QuantVersionProp = "graft.quant.sourceVersion"
  val QuantEpochProp = "graft.quant.epoch"
  private val QuantTxnApp = "graft-quant:"

  /** Attach the histogram bucket key of `valueCol` as `__qk`.
    *
    * The sketch is a DDSketch-shaped relative-error histogram (Masson
    * et al., VLDB 2019) with a deliberately DETERMINISTIC, engine-
    * portable bucket function: no logarithms, no randomness — only
    * integer arithmetic and IEEE +|-|*|/ (both correctly rounded and
    * bit-identical on the JVM and in any IEEE engine, which is what
    * lets an oracle replay the bucketing relationally).
    *
    *   w   = max(1, floor(|v| * scale + 0.5))        exact scaled magnitude
    *   e   = length(bin(w)) - 1                      exact floor(log2 w)
    *   key = sign(v) * (1 + e*sub + ((w - 2^e) * sub) div 2^e)   (0 for v=0)
    *
    * Each power-of-two octave splits into `sub` equal-width buckets, so
    * a bucket's midpoint misstates a member by at most 1/(2*sub)
    * relative (plus the 0.5/scale absolute rounding floor) — sub=16
    * gives ~3% rank-safe relative error at 8 bytes/bucket and ≤
    * 64*sub live buckets per sign. Ascending key order IS ascending
    * value order (negative keys mirror), so quantile readout is a
    * cumulative walk. */
  private def withBucketKey(df: DataFrame, valueCol: String, scale: Long,
                            sub: Int): DataFrame =
    df.withColumn("__w", greatest(lit(1L),
        floor(abs(col(valueCol)) * lit(scale.toDouble) + lit(0.5d))
          .cast("long")))
      .withColumn("__e", (length(bin(col("__w"))) - lit(1)).cast("int"))
      .withColumn("__q", expr("shiftleft(1L, __e)"))
      .withColumn("__qk",
        when(col(valueCol).isNull, lit(null).cast("long"))
          .when(col(valueCol) === 0d, lit(0L))
          .otherwise(signum(col(valueCol)).cast("long") *
            (lit(1L) + col("__e").cast("long") * lit(sub.toLong) +
              expr(s"((__w - __q) * ${sub}L) div __q"))))
      .drop("__w", "__e", "__q")

  /** The shared aggregation: per group, a (signed) row count, non-NULL
    * value count, and the bucket→count histogram map. `sgn` is +1 for
    * snapshot/append slices and ±1 for CDF slices — histogram counts
    * form a GROUP under addition (unlike HLL registers or CMS
    * counters), which is what makes retractions incrementally
    * absorbable. Two shuffles, both with map-side partials; the second
    * input is (groups × live buckets)-sized, never data-sized. */
  private def quantAgg(df: DataFrame, groupCols: Seq[String],
                       valueCol: String, scale: Long, sub: Int,
                       sgn: Column): DataFrame = {
    val gc = groupCols.map(col)
    withBucketKey(df, valueCol, scale, sub)
      .withColumn("__sgn", sgn)
      .groupBy((gc :+ col("__qk")): _*)
      .agg(sum(col("__sgn")).as("__c"))
      .groupBy(gc: _*)
      .agg(sum(col("__c")).as("n_rows"),
        sum(when(col("__qk").isNotNull, col("__c")).otherwise(0L))
          .as("n_vals"),
        // deterministic entry order; zero-net buckets stay out of the
        // map (a CDF slice's churn that cancels adds nothing)
        map_from_entries(array_sort(collect_list(
          when(col("__qk").isNotNull && col("__c") =!= 0L,
            struct(col("__qk"), col("__c")))))).as("quant_sketch"))
  }

  /** One-shot quantile rollup: per group, exact row/value counts + the
    * log2-octave histogram of `valueCol` (map<bigint,bigint>, ≤
    * 64*sub*2+1 entries ≈ KB-scale per group). */
  def quantRollup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  scale: Long = 100L, sub: Int = 16): DataFrame = {
    require(scale > 0 && sub > 0, s"quantRollup: scale=$scale sub=$sub")
    quantAgg(df, groupCols, valueCol, scale, sub, lit(1L))
  }

  /** Approximate quantiles from a rollup: for each requested q in
    * (0, 1], the midpoint value of the first bucket whose cumulative
    * count reaches rank ceil(q * n_vals) — within 1/(2*sub) relative
    * (+0.5/scale absolute) of the exact quantile. Groups with zero
    * non-NULL values emit no rows. The walk runs over the
    * (groups × buckets) relation, never the data. */
  def quantValues(rollup: DataFrame, groupCols: Seq[String],
                  qs: Seq[Double], scale: Long = 100L,
                  sub: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = rollup.sparkSession
    import spark.implicits._
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1), s"qs=$qs")
    val gc = groupCols.map(col)
    val w = Window.partitionBy(gc: _*).orderBy(col("bkey"))
    val exploded = rollup
      .select((gc :+ col("n_vals") :+ explode(col("quant_sketch"))): _*)
      .withColumnRenamed("key", "bkey").withColumnRenamed("value", "bcnt")
      .withColumn("cum", sum(col("bcnt")).over(w))
    val picked = exploded.crossJoin(qs.toDF("q"))
      .filter(col("cum") >=
        greatest(lit(1L), ceil(col("q") * col("n_vals")).cast("long")))
      .groupBy((gc :+ col("q")): _*)
      .agg(min(col("bkey")).as("bkey"), max(col("n_vals")).as("n_vals"))
    // midpoint reconstruction mirrors the bucket function: integer
    // octave/offset recovery, then IEEE arithmetic in a FIXED operation
    // order (an oracle replaying the same order reproduces every bit)
    picked
      .withColumn("__i", abs(col("bkey")) - lit(1L))
      .withColumn("__f", expr(s"__i % ${sub}L"))
      .withColumn("__qd",
        expr(s"cast(shiftleft(1L, cast(__i div ${sub}L as int)) as double)"))
      .withColumn("approx_value",
        when(col("bkey") === 0L, lit(0d))
          .otherwise(signum(col("bkey")) *
            ((col("__qd") + (col("__f").cast("double") + lit(0.5d)) *
              col("__qd") / lit(sub.toDouble)) / lit(scale.toDouble))))
      .drop("__i", "__f", "__qd", "bkey")
  }

  /** Per-ROW quantile readout of ONE histogram map column — the scalar
    * twin of [[quantValues]] (same rank definition, same midpoint
    * reconstruction), for surfaces that present a stored histogram
    * under a scalar name (SQL MV reads, [[quantReadoutSql]] callers).
    * Pure built-in HOFs over the ≤64·sub·2-entry map: a cumulative
    * walk of the key-sorted entries picks the first bucket whose count
    * reaches rank ceil(q·n), n being the map's own value sum — the
    * histogram carries its count, no companion column needed. Empty or
    * NULL map (a group whose values all retracted) reads NULL.
    * `qLit` is the SQL literal text of q, kept verbatim so DDL-supplied
    * quantiles round-trip without float reformatting. */
  def quantReadoutSql(mapCol: String, qLit: String, scale: Long = 100L,
                      sub: Int = 16): String = {
    require(qLit.toDouble > 0 && qLit.toDouble <= 1,
      s"quantile must be in (0,1], got $qLit")
    val n = s"aggregate(map_values($mapCol), 0L, (a, v) -> a + v)"
    // midpoint of bucket k: sign(k) * (2^(i div sub) * (1 + (i%sub + 0.5)/sub)) / scale
    // with i = |k|-1 — the quantValues reconstruction, fixed op order
    val mid = s"""CASE WHEN acc.k IS NULL THEN CAST(NULL AS DOUBLE)
      WHEN acc.k = 0L THEN 0.0D
      ELSE CAST(SIGN(acc.k) AS DOUBLE) *
        ((CAST(shiftleft(1L, CAST((ABS(acc.k) - 1) DIV $sub AS INT)) AS DOUBLE)
          + (CAST((ABS(acc.k) - 1) % $sub AS DOUBLE) + 0.5D)
            * CAST(shiftleft(1L, CAST((ABS(acc.k) - 1) DIV $sub AS INT)) AS DOUBLE)
            / CAST($sub AS DOUBLE))
         / CAST($scale AS DOUBLE)) END"""
    s"""CASE WHEN $mapCol IS NULL OR size($mapCol) = 0 THEN CAST(NULL AS DOUBLE)
      ELSE aggregate(
        array_sort(map_entries($mapCol)),
        named_struct('cum', 0L, 'k', CAST(NULL AS BIGINT)),
        (acc, e) -> IF(acc.k IS NOT NULL, acc,
          named_struct('cum', acc.cum + e.value,
            'k', IF(acc.cum + e.value >=
                      GREATEST(1L, CAST(CEIL($qLit * $n) AS BIGINT)),
                    e.key, CAST(NULL AS BIGINT)))),
        acc -> $mid) END"""
  }

  /** Materialize the quantile rollup of `src` into `mv` and persist the
    * definition for [[refreshQuant]]. */
  def createQuant(src: VersionedTable, mv: VersionedTable,
                  groupCols: Seq[String], valueCol: String,
                  scale: Long = 100L, sub: Int = 16): Unit = {
    val v = src.latestVersion.getOrElse(
      sys.error(s"quantile rollup: empty table at ${src.root}"))
    clearReplacedDefinition(mv)
    mv.overwrite(quantRollup(src.readVersion(v), groupCols, valueCol,
      scale, sub))
    val epoch = mv.properties.get(QuantEpochProp)
      .flatMap(e => scala.util.Try(e.toLong).toOption).getOrElse(-1L) + 1
    mv.setProperties(Map(
      QuantSourceProp -> src.root, QuantGroupProp -> groupCols.mkString(","),
      QuantValueProp -> valueCol, QuantParamsProp -> s"$scale,$sub",
      QuantVersionProp -> v.toString, QuantEpochProp -> epoch.toString))
    // retention floor on the source (same contract as the exact MV
    // families): vacuum must not reclaim the covered version or the
    // added/change sets the next refresh reads
    src.setPin(graft.plans.JoinMv.pinName(mv), v)
  }

  /** Catch the quantile rollup up with its source. Append-only tails
    * absorb as bucket-count additions (`"incremental"`); slices WITH
    * retractions still absorb when the source's change feed is on —
    * deletes subtract from exactly the buckets they once incremented,
    * so the merged histogram EQUALS a rebuild's (`"cdf"` — the
    * capability HLL and CMS rollups structurally lack). Only a
    * feed-inexpressible slice (overwrite/restore mid-range, NULL group
    * keys) rebuilds (`"full"`). Crash replays are txn-ledger no-ops. */
  def refreshQuant(spark: SparkSession, mv: VersionedTable): String = {
    val props = mv.properties
    val src = VersionedTable(spark, props.getOrElse(QuantSourceProp,
      sys.error(s"${mv.root} is not a quantile rollup (no $QuantSourceProp)")))
    val groupCols = props(QuantGroupProp).split(",").toSeq
    val valueCol = props(QuantValueProp)
    val Array(scale, sub) = props(QuantParamsProp).split(",")
    val txnApp = QuantTxnApp + props.getOrElse(QuantEpochProp, "0") +
      ":" + mv.root
    val v0Prop = props(QuantVersionProp).toLong
    val v0 = math.max(v0Prop, mv.lastTxnVersion(txnApp).getOrElse(v0Prop))
    val hist = src.history
    val head = hist.lastOption.map(_.version).getOrElse(v0)
    val later = hist.filter(e => e.version > v0 && e.version <= head)
    val absorbless = graft.tables.GraftSql.AbsorblessActions
    def finish(mode: String): String = {
      if (head > v0Prop)
        mv.setProperties(Map(QuantVersionProp -> head.toString))
      if (hist.exists(_.version == head))
        src.setPin(graft.plans.JoinMv.pinName(mv), head)
      mode
    }
    def recompute(): String = {
      mv.overwrite(quantRollup(src.readVersion(head), groupCols, valueCol,
        scale.toLong, sub.toInt))
      finish("full")
    }
    // shared by the append and CDF paths — only the slice and sign differ
    def absorb(slice: DataFrame, sgn: Column,
               mode: String): Option[String] = {
      val delta = quantAgg(slice, groupCols, valueCol, scale.toLong,
        sub.toInt, sgn)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // one full-consumption probe (empties + NULL keys) that also
        // materializes the persist (GraftSql.probeDelta)
        val (nRows, nNullKeys) =
          graft.tables.GraftSql.probeDelta(delta, groupCols)
        // a DML commit that matched zero rows feeds an empty slice
        if (nRows == 0L) Some(finish("noop"))
        // NULL group values cannot ride the merge (NULL never matches)
        else if (nNullKeys > 0L) None
        else {
          mv.merge(delta, groupCols, updateExprs = Map(
            "n_rows" -> ((t: Column, u: Column) => t + u),
            "n_vals" -> ((t: Column, u: Column) => t + u),
            // bucket-wise signed addition, zero-count buckets dropped:
            // the merged map is EXACTLY the map a rebuild would produce
            "quant_sketch" -> ((t: Column, u: Column) => map_filter(
              map_zip_with(t, u, (_, a, b) =>
                coalesce(a, lit(0L)) + coalesce(b, lit(0L))),
              (_, x) => x =!= 0L))),
            txn = Some((txnApp, head)))
          // emptied groups drop, as a recompute would (idempotent —
          // a crash replay that no-ops the merge still converges)
          if (!mv.read.filter(col("n_rows") === 0L).limit(1).isEmpty) {
            mv.delete(col("n_rows") === 0L)
            ()
          }
          Some(finish(mode))
        }
      } finally { delta.unpersist(); () }
    }
    if (later.isEmpty || later.forall(e => absorbless(e.action)))
      finish("noop")
    else if (later.forall(e =>
        e.action == "append" || absorbless(e.action)) &&
        src.addedSetsLive(v0, head) &&
        absorb(src.readAddedBetween(v0, head), lit(1L), "incremental")
          .isDefined)
      "incremental"
    else if (src.changeFeedEnabled) {
      try {
        val sgn = when(col("_change_type")
            .isin("insert", "update_postimage"), 1L)
          .when(col("_change_type")
            .isin("delete", "update_preimage"), -1L)
        absorb(src.readChangeFeed(v0, Some(head)), sgn, "cdf")
          .getOrElse(recompute())
      } catch {
        case _: graft.tables.CdfNotExpressible => recompute()
      }
    } else recompute()
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
