package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.{GraftSql, VersionedTable}

/** Join-shaped materialized views: `SELECT g…, aggs… FROM fact JOIN dim
  * ON keys GROUP BY g…` materialized as a table, transparently routed
  * by [[MvRewrite.registerJoin]], and MAINTAINED incrementally from the
  * FACT table's change feed — the reference's gold fact⋈dim rollups
  * (notebooks/04_gold, scheduled full recomputes) as an incrementally
  * kept table.
  *
  * '''Maintenance math.''' With the dim side FIXED at its covered
  * snapshot, the inner join distributes over the fact's row-set delta:
  * `(F + ΔF) ⋈ D = (F ⋈ D) + (ΔF ⋈ D)`. So one slice of the fact's
  * row-level change feed, joined to the PINNED dim snapshot, is itself
  * a valid signed change slice for the flat group-by — and the whole
  * single-table signed-delta machinery ([[GraftSql.applyCdfDelta]]:
  * +postimage/insert, −preimage/delete, emptied groups drop, all-NULL
  * sums NULL-fix) applies verbatim. A duplicate-keyed dim multiplies
  * delta rows exactly as it multiplies a full recompute's, so the
  * identity needs no uniqueness assumption. Cost per refresh:
  * O(changed fact rows) + the touched MV cells — never O(fact).
  *
  * '''Dim changes''' break the fixed-dim identity and trigger a full
  * re-materialization (the Databricks MV position for non-SCD dims);
  * dims are small and slow-moving by construction, so this is the
  * right trade at 100 TB — the fact table is what churns.
  *
  * State is durable in the MV table's properties (`graft.mv.join.*`),
  * so [[refresh]] works in a fresh process and re-arms routing, the
  * same restart discipline as the SQL MV surface. Exactly-once across
  * crash/retry: the maintenance merge carries a txn marker keyed on
  * the covered fact version, and refresh resumes from
  * max(property, txn ledger) — a replayed slice is a metadata no-op.
  */
object JoinMv {

  val FactProp = "graft.mv.join.fact"
  val DimProp = "graft.mv.join.dim"
  val KeysProp = "graft.mv.join.keys" // "lk=rk,…"
  val GroupProp = "graft.mv.join.group"
  val AggsProp = "graft.mv.join.aggs" // "fn:col:out;…"
  val FactVersionProp = "graft.mv.join.factVersion"
  val DimVersionProp = "graft.mv.join.dimVersion"
  /** Bumped on every [[create]] — namespaces the txn ledger so markers
    * from a replaced definition era are never consulted. */
  val EpochProp = "graft.mv.join.epoch"
  private val TxnApp = "graft-mvjoin:"

  /** The registered join, aggregated: both sides PINNED at explicit
    * versions (maintenance must never read a live head another writer
    * is advancing). */
  private def rollup(fact: VersionedTable, dim: VersionedTable,
                     keys: Seq[(String, String)], groupCols: Seq[String],
                     aggs: Seq[(String, String, String)],
                     factV: Long, dimV: Long): DataFrame = {
    val f = fact.readVersion(factV)
    val d = dim.readVersion(dimV)
    joinOn(f, d, keys)
      .groupBy(groupCols.map(col): _*)
      .agg(GraftSql.mvAggColumns(aggs).head,
        GraftSql.mvAggColumns(aggs).tail: _*)
  }

  private def joinOn(f: DataFrame, d: DataFrame,
                     keys: Seq[(String, String)]): DataFrame = {
    val j = f.join(d, keys.map { case (lk, rk) => f(lk) === d(rk) }
      .reduce(_ && _))
    // drop the dim side's same-named key duplicates so group/agg
    // references resolve unambiguously (the sides are value-equal
    // under the inner join, so either column serves)
    keys.collect { case (l, r) if l == r => d(r) }.foldLeft(j)(_.drop(_))
  }

  /** Materialize the join rollup into `mv` at the sources' CURRENT
    * versions, persist the definition, and arm transparent routing. */
  def create(fact: VersionedTable, dim: VersionedTable,
             keys: Seq[(String, String)], groupCols: Seq[String],
             aggs: Seq[MvRewrite.AggSpec], mv: VersionedTable): Unit = {
    val factV = fact.latestVersion.getOrElse(
      sys.error(s"join MV: empty fact table at ${fact.root}"))
    val dimV = dim.latestVersion.getOrElse(
      sys.error(s"join MV: empty dim table at ${dim.root}"))
    val specs = aggs.map(a => (a.fn, a.col, a.mvCol))
    // a REPLACE with a different group set must not inherit the old
    // definition's merge bucketing; and a replaced SINGLE-TABLE MV's
    // properties must go, or REFRESH would see two definitions
    if (mv.exists) {
      mv.clearBucketSpec()
      mv.unsetProperties(Seq(GraftSql.MvSourceProp, GraftSql.MvGroupProp,
        GraftSql.MvAggsProp, GraftSql.MvVersionProp, GraftSql.MvWhereProp))
    }
    mv.overwrite(rollup(fact, dim, keys, groupCols, specs, factV, dimV))
    val epoch = mv.properties.get(EpochProp)
      .flatMap(e => scala.util.Try(e.toLong).toOption).getOrElse(-1L) + 1
    mv.setProperties(Map(
      FactProp -> fact.root, DimProp -> dim.root,
      KeysProp -> keys.map { case (l, r) => s"$l=$r" }.mkString(","),
      GroupProp -> groupCols.mkString(","),
      AggsProp -> specs.map { case (f, c, o) => s"$f:$c:$o" }.mkString(";"),
      FactVersionProp -> factV.toString, DimVersionProp -> dimV.toString,
      EpochProp -> epoch.toString))
    armRouting(fact, dim, keys, mv, groupCols, aggs, factV, dimV)
  }

  /** Routing registration, skipped for sketch-bearing definitions:
    * an hll ESTIMATE must never transparently replace a query's own
    * aggregate (different estimator, silently different numbers). A
    * REPLACE that turned an armed exact MV into a sketch-bearing one
    * drops the stale registration instead. */
  private def armRouting(fact: VersionedTable, dim: VersionedTable,
      keys: Seq[(String, String)], mv: VersionedTable,
      groupCols: Seq[String], aggs: Seq[MvRewrite.AggSpec],
      factV: Long, dimV: Long): Unit =
    if (aggs.exists(_.fn == "hll")) MvRewrite.deregisterRoot(mv.root)
    else MvRewrite.registerJoin(fact, dim, keys, mv, groupCols, aggs,
      leftVersion = Some(factV), rightVersion = Some(dimV))

  /** Re-arm routing from the durable definition (post-restart). */
  def arm(spark: SparkSession, mv: VersionedTable): Unit = {
    val d = definition(spark, mv)
    armRouting(d.fact, d.dim, d.keys, mv, d.groupCols,
      d.aggs.map { case (f, c, o) => MvRewrite.AggSpec(f, c, o) },
      d.factV, d.dimV)
  }

  private final case class Def(fact: VersionedTable, dim: VersionedTable,
                               keys: Seq[(String, String)],
                               groupCols: Seq[String],
                               aggs: Seq[(String, String, String)],
                               factV: Long, dimV: Long, epoch: String)

  private def definition(spark: SparkSession, mv: VersionedTable): Def = {
    val p = mv.properties
    def need(k: String): String = p.getOrElse(k,
      sys.error(s"${mv.root} is not a join MV (missing $k)"))
    Def(
      VersionedTable(spark, need(FactProp)),
      VersionedTable(spark, need(DimProp)),
      need(KeysProp).split(",").toSeq.map { kv =>
        val Array(l, r) = kv.split("=", 2); (l, r)
      },
      need(GroupProp).split(",").toSeq,
      GraftSql.parseAggSpecs(need(AggsProp)),
      need(FactVersionProp).toLong, need(DimVersionProp).toLong,
      p.getOrElse(EpochProp, "0"))
  }

  /** Catch the MV up with its sources and re-arm routing. Returns the
    * maintenance mode used:
    *
    *   - `"noop"`: nothing new (or only data-identical maintenance
    *     commits — compaction etc.) on either side; version pins
    *     advance and routing re-arms on the new snapshots.
    *   - `"cdf"`: dim unchanged, fact changes absorbed as signed
    *     deltas from the change feed joined to the pinned dim —
    *     O(changed fact rows). Needs sum/count-only aggs with the
    *     count companions ([[GraftSql.cdfMaintainable]]).
    *   - `"groups"`: dim unchanged, fact CDF on, but min/max (or a
    *     companion-less sum) in the agg set — the feed names the
    *     touched groups (through the dim join), ONLY those groups
    *     recompute from the pinned snapshots and merge; vanished
    *     groups delete. O(changed groups × group size).
    *   - `"full"`: dim moved, CDF unavailable, or a NULL group key in
    *     the delta — re-materialize both sides at their heads.
    */
  def refresh(spark: SparkSession, mv: VersionedTable): String = {
    val d = definition(spark, mv)
    val txnApp = TxnApp + d.epoch + ":" + mv.root
    // resume from max(property, ledger): a crash between the merge and
    // the property bump must not double-count the absorbed slice
    val v0 = math.max(d.factV, mv.lastTxnVersion(txnApp).getOrElse(d.factV))
    val factHistory = d.fact.history
    val factHead = factHistory.lastOption.map(_.version).getOrElse(v0)
    val dimHead = d.dim.latestVersion.getOrElse(d.dimV)
    val later = factHistory.filter(e => e.version > v0 && e.version <= factHead)
    // the shared set INCLUDES rename/drop-column: the DDL guards refuse
    // touching group/key columns and re-key agg specs, so those commits
    // are metadata-only on either side — a dim rename must not trigger
    // an O(fact) re-materialization
    val absorbless = GraftSql.AbsorblessActions
    def finish(mode: String, fv: Long, dv: Long): String = {
      if (fv > d.factV || dv > d.dimV)
        mv.setProperties(Map(FactVersionProp -> fv.toString,
          DimVersionProp -> dv.toString))
      armRouting(d.fact, d.dim, d.keys, mv, d.groupCols,
        d.aggs.map { case (f, c, o) => MvRewrite.AggSpec(f, c, o) },
        fv, dv)
      mode
    }
    def recompute(): String = {
      mv.overwrite(rollup(d.fact, d.dim, d.keys, d.groupCols, d.aggs,
        factHead, dimHead))
      finish("full", factHead, dimHead)
    }
    val dimMoved = {
      val dl = d.dim.history
        .filter(e => e.version > d.dimV && e.version <= dimHead)
      dl.exists(e => !absorbless(e.action))
    }
    if (dimMoved) recompute()
    else if (later.isEmpty || later.forall(e => absorbless(e.action)))
      finish("noop", factHead, dimHead)
    else if (!d.fact.changeFeedEnabled) recompute()
    else if (GraftSql.cdfMaintainable(d.aggs)) {
      // the fixed-dim identity: ΔF ⋈ D is the group-by's change slice
      val feed = d.fact.readChangeFeed(v0, Some(factHead))
      val dimSnap = d.dim.readVersion(d.dimV)
      try {
        GraftSql.applyCdfDelta(mv, joinOn(feed, dimSnap, d.keys),
          d.groupCols, d.aggs, txn = Some((txnApp, factHead)))
        finish("cdf", factHead, dimHead)
      } catch {
        case _: graft.tables.CdfNotExpressible => recompute()
      }
    } else {
      // min/max: per-touched-group recompute — the CDF (joined to the
      // pinned dim) names which groups moved; only those re-aggregate.
      // The recompute+tombstone+replace core is GraftSql's shared
      // helper — only the source relation (fact⋈dim) differs here.
      try {
        val feed = d.fact.readChangeFeed(v0, Some(factHead))
        val dimSnap = d.dim.readVersion(d.dimV)
        GraftSql.mergeTouchedGroups(mv,
          joinOn(feed, dimSnap, d.keys)
            .select(d.groupCols.map(col): _*).distinct(),
          joinOn(d.fact.readVersion(factHead), dimSnap, d.keys),
          d.groupCols, d.aggs, txnApp, factHead)
        finish("groups", factHead, dimHead)
      } catch {
        case _: graft.tables.CdfNotExpressible => recompute()
      }
    }
  }
}
