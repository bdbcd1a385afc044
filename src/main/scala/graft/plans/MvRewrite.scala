package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DoubleType

import graft.tables.VersionedTable

/** Transparent materialized-view routing — a Catalyst optimizer rule.
  *
  * A registered MV declares "table `mv` holds `SELECT groupCols, aggs
  * FROM source GROUP BY groupCols` as of source snapshot S". The rule
  * rewrites any matching logical [[Aggregate]] over that exact snapshot
  * to a scan of the MV instead — the 100 TB aggregation the user wrote
  * becomes a read of a few thousand pre-computed rows, with zero query
  * changes (the BI-dashboard query pattern MV maintenance exists for).
  *
  * **Freshness is structural, not advisory.** Registration snapshots the
  * source scan's file-set root paths; the rule fires only when the
  * query's own scan resolves to the identical path set. Any commit to
  * the source (append/merge/compact/DDL) changes its snapshot's file-set
  * list, so a stale MV silently stops matching and the query falls back
  * to the source — wrong-answer-by-staleness is impossible by
  * construction. After an incremental refresh (see `q_mv_incremental`'s
  * `readAddedSince` / CDF patterns), re-[[register]] to re-arm.
  *
  * Match surface (deliberately conservative — anything else is left
  * untouched): a single [[Aggregate]] over the source scan
  * (attribute-only Projects are stripped; joins or expression inputs
  * bail), with aggregates drawn from `sum(col)`, `count(*)`,
  * `count(col)`, `min(col)`, `max(col)` that the MV materialized, plus
  * `avg(col)` derived as `sum(col)/count(col)` when both are
  * registered. Distinct aggregates and FILTER clauses bail. Grouping
  * may be the registered group columns exactly (served as a Project of
  * the MV) or any strict subset of them, including none — the rollup
  * rewrite: the MV re-aggregates (`count` re-sums, min/max re-combine,
  * avg re-derives), exact because MV rows partition source rows by the
  * full group set. A deterministic Filter between aggregate and scan
  * rewrites onto the MV when it references group columns only. The
  * rewrite aliases MV columns to the original output attribute ids, so
  * the parent plan is untouched.
  *
  * Wire-up: [[MvRewrite.install]] arms an existing session via
  * `spark.experimental.extraOptimizations`; [[GraftSparkExtensions]] is
  * the `spark.sql.extensions`-config form for session build time. The
  * rule is a no-op while the registry is empty and idempotent once
  * rewritten (the MV scan's paths match no registration's source).
  *
  * Reference behavior ground: the reference maintains gold rollups as
  * scheduled full recomputes (transform/gold_*.sql); Spark-first, the
  * rollup is an incrementally-merged table plus this routing rule.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** One materialized aggregate: `fn(col) AS mvCol` with `fn` in
    * sum|count|min|max and `col == "*"` for `count(*)`. */
  final case class AggSpec(fn: String, col: String, mvCol: String)

  private final case class Entry(sourcePaths: Set[String],
                                 groupCols: Seq[String],
                                 aggs: Map[(String, String), String],
                                 mvRead: () => DataFrame)

  // keyed by MV root — registry is process-wide (table roots are
  // globally unique paths); values are tiny metadata
  private val entries = new ConcurrentHashMap[String, Entry]()

  /** Arm `mv` as the materialization of `SELECT groupCols, aggs FROM
    * source GROUP BY groupCols` at the source's CURRENT snapshot.
    * Refused unless the snapshot reads as one plain scan (no deletion
    * vectors, schema generations or column mapping — shapes whose read
    * plans the conservative matcher would never fire on anyway). */
  def register(source: VersionedTable, mv: VersionedTable,
               groupCols: Seq[String], aggs: Seq[AggSpec],
               atVersion: Option[Long] = None): Unit = {
    require(aggs.forall(a => Set("sum", "count", "min", "max")(a.fn)),
      s"MV rewrite: unsupported agg fn in ${aggs.map(_.fn).mkString(",")}")
    // `atVersion` pins the registration to the snapshot the MV was
    // MATERIALIZED from: registering the live head would cover a
    // concurrent commit the MV never absorbed — queries over that head
    // would silently miss its rows
    val snap = atVersion.fold(source.read)(source.readVersion)
    val paths = scanWithFilters(snap.queryExecution.analyzed)
      .collect { case (ps, Nil) => ps }
      .getOrElse(sys.error("MV rewrite: source snapshot is not a plain " +
        s"single-relation scan at ${source.root} — registration refused"))
    val mvCols = mv.read.columns.toSet
    val missing = (groupCols ++ aggs.map(_.mvCol)).filterNot(mvCols)
    require(missing.isEmpty,
      s"MV rewrite: MV at ${mv.root} lacks columns ${missing.mkString(",")}")
    entries.put(mv.root,
      Entry(paths, groupCols,
        aggs.map(a => (a.fn, a.col) -> a.mvCol).toMap, () => mv.read))
  }

  def deregister(mv: VersionedTable): Unit = deregisterRoot(mv.root)

  /** Whether the table's current snapshot reads as one plain relation —
    * the only shape [[register]] accepts and the matcher can serve.
    * Callers use this to skip registration quietly instead of catching
    * the refusal (which would also swallow genuine errors). */
  def isPlainSnapshot(source: VersionedTable,
                      atVersion: Option[Long] = None): Boolean =
    scanWithFilters(atVersion.fold(source.read)(source.readVersion)
      .queryExecution.analyzed).exists(_._2.isEmpty)

  /** Leaf parquet root paths of a DataFrame's OPTIMIZED plan — which
    * table a query would actually scan after this rule runs. Shared by
    * the driver queries and specs that pin serve-from-MV behavior. */
  def scannedPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case r: HadoopFsRelation => r.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten

  /** Root-keyed form — DROP TABLE must un-arm a registered MV before the
    * files go away, or the rule would route queries to a dead path. */
  def deregisterRoot(root: String): Unit = entries.remove(root)

  /** Arm an already-built session (Verify/Bench/tests). Idempotent. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (entries.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  /** The scan's file-set roots plus any deterministic Filter conditions
    * collected on the way down, when the plan is exactly one parquet
    * relation under attribute-only Projects and Filters — the snapshot
    * identity the freshness check compares. Subquery-bearing or
    * non-deterministic predicates bail. */
  private def scanWithFilters(
      p: LogicalPlan): Option[(Set[String], Seq[Expression])] = p match {
    case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      scanWithFilters(c)
    case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.deterministic &&
          f.condition.find(_.isInstanceOf[PlanExpression[_]]).isEmpty =>
      scanWithFilters(f.child).map { case (paths, fs) =>
        (paths, f.condition +: fs)
      }
    case l: LogicalRelation => l.relation match {
      case r: HadoopFsRelation =>
        Some((r.location.rootPaths.map(_.toString).toSet, Nil))
      case _ => None
    }
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = for {
    pf <- scanWithFilters(agg.child)
    groupAttrs <- Some(agg.groupingExpressions).collect {
      case gs if gs.forall(_.isInstanceOf[AttributeReference]) =>
        gs.map(_.asInstanceOf[AttributeReference])
    }
    // several MVs can cover the same snapshot (different agg sets) —
    // serve from the first whose registered surface covers this query
    plan <- entries.values.asScala
      .filter(_.sourcePaths == pf._1)
      .view.flatMap(rewriteAgainst(agg, groupAttrs, pf._2, _)).headOption
  } yield plan

  /** One candidate MV against one aggregate: exact group match serves a
    * Project of the MV; a strict SUBSET of the MV's group columns
    * (including none — a global aggregate) re-aggregates the MV — the
    * classic rollup rewrite, exact because MV rows partition source
    * rows by the full group set and sum/count/min/max all re-combine.
    * A Filter between aggregate and scan rewrites onto the MV when it
    * references group columns only (a row predicate on group columns IS
    * a group predicate). */
  private def rewriteAgainst(agg: Aggregate, groupAttrs: Seq[AttributeReference],
                             filters: Seq[Expression],
                             entry: Entry): Option[LogicalPlan] = {
    val qGroups = groupAttrs.map(_.name).toSet
    val mvGroups = entry.groupCols.toSet
    if (!qGroups.subsetOf(mvGroups)) return None
    if (!filters.forall(_.references.forall(a => mvGroups(a.name))))
      return None
    // resolve the MV scan only after the cheap metadata match succeeded
    val mvPlan = entry.mvRead().queryExecution.analyzed
    val mvAttr: Map[String, Attribute] = mvPlan.output.map(a => a.name -> a).toMap
    val base: LogicalPlan =
      if (filters.isEmpty) mvPlan
      else org.apache.spark.sql.catalyst.plans.logical.Filter(
        filters.map(_.transform {
          case a: AttributeReference => mvAttr(a.name)
        }).reduce(And), mvPlan)
    if (qGroups == mvGroups) buildProjection(agg, entry, base, mvAttr)
    else buildRollup(agg, groupAttrs, entry, base, mvAttr)
  }

  /** Exact-group service: map every output expression of `agg` onto MV
    * columns; None (no rewrite) the moment anything falls outside the
    * registered surface. */
  private def buildProjection(agg: Aggregate, entry: Entry,
                              base: LogicalPlan,
                              mvAttr: Map[String, Attribute]): Option[LogicalPlan] = {
    val groupNames = entry.groupCols.toSet

    def aggCol(fn: String, c: String): Option[Expression] =
      entry.aggs.get((fn, c)).map(mvAttr)

    def rewriteOne(e: Expression): Option[Expression] = e match {
      case a: AttributeReference if groupNames(a.name) => mvAttr.get(a.name)
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case c: Count => c.children match {
            // count(<non-null literal>) == count(*); count(NULL) is 0
            // per group and must NOT serve from the row count — bail
            case Seq(Literal(v, _)) if v != null => aggCol("count", "*")
            case Seq(a: AttributeReference)      => aggCol("count", a.name)
            case _                               => None
          }
          case s: Sum => s.child match {
            case a: AttributeReference => aggCol("sum", a.name)
            case _                     => None
          }
          case m: Min => m.child match {
            case a: AttributeReference => aggCol("min", a.name)
            case _                     => None
          }
          case m: Max => m.child match {
            case a: AttributeReference => aggCol("max", a.name)
            case _                     => None
          }
          // avg derives from materialized sum+count of the SAME column
          // (count(col) — null-skipping — not count(*)); double-typed
          // originals only, so the division has Average's exact output
          // type and an all-null group stays NULL (x/0 → NULL). For an
          // INTEGRAL source column (sums below 2^53) the served value is
          // bit-for-bit Spark's; for a double source column the MV's sum
          // was accumulated in a different partition order than a direct
          // Average would be, so the served avg can differ at ULP level —
          // the same non-determinism Spark itself exhibits across runs
          // (FP sum order is not a guarantee of ANY plan, with or
          // without the rewrite)
          case av: Average if av.dataType == DoubleType => av.child match {
            case a: AttributeReference => for {
              s <- aggCol("sum", a.name)
              c <- aggCol("count", a.name)
            } yield Divide(Cast(s, DoubleType), Cast(c, DoubleType))
            case _ => None
          }
          case _ => None
        }
      case _ => None
    }

    aliasOutputs(agg, rewriteOne).map(Project(_, base))
  }

  /** Rollup service: the query groups by a strict subset of the MV's
    * group columns, so every output aggregate re-combines MV cells —
    * sum/count re-sum, min/max re-min/max, avg re-derives from re-summed
    * sum+count. */
  private def buildRollup(agg: Aggregate, groupAttrs: Seq[AttributeReference],
                          entry: Entry, base: LogicalPlan,
                          mvAttr: Map[String, Attribute]): Option[LogicalPlan] = {
    val qGroupNames = groupAttrs.map(_.name).toSet

    def aggCol(fn: String, c: String): Option[Expression] =
      entry.aggs.get((fn, c)).map(mvAttr)
    def reSum(c: Option[Expression]): Option[Expression] =
      c.map(x => Sum(x).toAggregateExpression())

    def rewriteOne(e: Expression): Option[Expression] = e match {
      case a: AttributeReference if qGroupNames(a.name) => mvAttr.get(a.name)
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case c: Count => c.children match {
            // same count(NULL) guard as the exact path
            case Seq(Literal(v, _)) if v != null =>
              reSum(aggCol("count", "*"))
            case Seq(a: AttributeReference) => reSum(aggCol("count", a.name))
            case _                          => None
          }
          case s: Sum => s.child match {
            case a: AttributeReference => reSum(aggCol("sum", a.name))
            case _                     => None
          }
          case m: Min => m.child match {
            case a: AttributeReference =>
              aggCol("min", a.name).map(x => Min(x).toAggregateExpression())
            case _ => None
          }
          case m: Max => m.child match {
            case a: AttributeReference =>
              aggCol("max", a.name).map(x => Max(x).toAggregateExpression())
            case _ => None
          }
          case av: Average if av.dataType == DoubleType => av.child match {
            case a: AttributeReference => for {
              s <- reSum(aggCol("sum", a.name))
              c <- reSum(aggCol("count", a.name))
            } yield Divide(Cast(s, DoubleType), Cast(c, DoubleType))
            case _ => None
          }
          case _ => None
        }
      case _ => None
    }

    aliasOutputs(agg, rewriteOne).map(
      Aggregate(groupAttrs.map(a => mvAttr(a.name)), _, base))
  }

  /** Rewrite each output slot via `rewriteOne`, preserving the original
    * names, exprIds, types and declared non-nullability. */
  private def aliasOutputs(agg: Aggregate,
      rewriteOne: Expression => Option[Expression]): Option[Seq[NamedExpression]] = {
    val rewritten: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case al @ Alias(child, name) =>
        rewriteOne(child).flatMap(retype(_, al.dataType, al.nullable)).map {
          ex => Alias(ex, name)(exprId = al.exprId, qualifier = al.qualifier)
        }
      case ar: AttributeReference =>
        rewriteOne(ar).flatMap(retype(_, ar.dataType, ar.nullable)).map {
          ex => Alias(ex, ar.name)(exprId = ar.exprId, qualifier = ar.qualifier)
        }
      case _ => None
    }
    if (rewritten.forall(_.isDefined)) Some(rewritten.flatten) else None
  }

  /** Match the original output slot's type exactly; restore declared
    * non-nullability (count(*) is non-null) where a literal default
    * exists. An un-castable type mismatch returns None — the whole
    * rewrite bails rather than planting an unresolvable Cast. */
  private def retype(e: Expression, dt: org.apache.spark.sql.types.DataType,
                     nullable: Boolean): Option[Expression] = {
    val typed =
      if (e.dataType == dt) Some(e)
      else if (Cast.canCast(e.dataType, dt))
        Some(Cast(e, dt, Some(conf.sessionLocalTimeZone)))
      else None
    typed.map { t =>
      if (!nullable && t.nullable) Coalesce(Seq(t, Literal.default(dt)))
      else t
    }
  }
}

/** `spark.sql.extensions=graft.plans.GraftSparkExtensions` — build-time
  * registration of the graft optimizer rules. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => MvRewrite)
}
