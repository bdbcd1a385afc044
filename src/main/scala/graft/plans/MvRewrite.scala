package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project, ResolvedHint, Union, Filter => LFilter}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, StructType}

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
  * **Freshness is structural, not advisory.** Registration decomposes the
  * source scan into a [[SourceSig]] — the set of every leaf file-set
  * root path (data arms AND deletion-vector sidecars) plus, per arm, the
  * exact per-column source expressions the graft read projects (rename
  * aliases, widening casts, null pads for added columns, DV row-identity
  * columns). The rule fires only when the query's own scan decomposes to
  * a signature the registration covers. Any commit to the source
  * (append/merge/compact/DV delete/ADD COLUMN/widen) changes its
  * snapshot's file-set or DV list, so a stale MV silently stops matching
  * and the query falls back to the source — wrong-answer-by-staleness is
  * impossible by construction. Column-mapping DDL (RENAME/DROP COLUMN)
  * carries file-sets verbatim, but it changes the arm projections and the
  * logical column names, so a query touching the re-mapped column stops
  * matching too, while queries over untouched columns (whose data the
  * DDL did not change) keep serving. After an incremental refresh (see
  * `q_mv_incremental`'s `readAddedSince` / CDF patterns), re-[[register]]
  * to re-arm.
  *
  * Match surface (deliberately conservative — anything else is left
  * untouched): a single [[Aggregate]] over the source scan — one plain
  * relation, a union of per-schema-generation arms, or either under the
  * standard DV anti-join — or over an INNER equi-join of two such scans
  * ([[registerJoin]]: the gold fact⋈dim rollup; freshness is structural
  * on both sides, inferred join-key IsNotNull pushdowns are recognized
  * and discarded, and either side order matches) — with aggregates
  * drawn from `sum(col)`,
  * `count(*)`, `count(col)`, `min(col)`, `max(col)` that the MV
  * materialized, plus `avg(col)` derived as `sum(col)/count(col)` when
  * both are registered. Distinct aggregates and FILTER clauses bail.
  * Grouping may be the registered group columns exactly (served as a
  * Project of the MV) or any strict subset of them, including none — the
  * rollup rewrite: the MV re-aggregates (`count` re-sums, min/max
  * re-combine, avg re-derives), exact because MV rows partition source
  * rows by the full group set. A deterministic Filter rewrites onto the
  * MV when it references group columns only — including predicates the
  * optimizer already pushed below the union into every arm (they hoist
  * back to logical columns through each arm's projection and must agree
  * across arms). The rewrite aliases MV columns to the original output
  * attribute ids, so the parent plan is untouched.
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

  /** Structural identity of one source snapshot read. `totalPaths` is
    * every leaf root the read touches (file-set arms plus DV sidecars) —
    * the freshness key: any data or DV commit changes it. `arms` maps
    * each scan arm's path set to its per-logical-column source
    * descriptors (see [[describe]]) — the projection key: column-mapping
    * DDL changes these without touching paths, and a user query that
    * re-aliases columns over the same files (e.g. `select(v as k)`)
    * produces descriptors no registration carries, so neither can serve
    * stale or swapped results. */
  private final case class SourceSig(totalPaths: Set[String],
                                     arms: Map[Set[String], Map[String, String]])

  /** What a registration covers: one table's snapshot read, or an
    * INNER equi-join of two snapshot reads on named key pairs. */
  private sealed trait RegSig
  private final case class ScanSig(sig: SourceSig) extends RegSig
  /** An INNER equi-join of N snapshot reads (N ≥ 2 — the fact⋈dim
    * rollup and its star/snowflake extension). `edges` are unordered
    * pairs of (side index, column name) equated by the join condition.
    * Matching compares the transitive equality PARTITION of those
    * nodes, not the raw edge set, so a query spelling `fact.k = d2.k`
    * where the registration spelled `d1.k = d2.k` (equivalent under
    * the other equality) still serves. Registration guarantees every
    * name the group/agg surface references lives on exactly one side
    * (or only on key-connected, value-equal sides), so the rewrite
    * stage can stay name-based. */
  private final case class JoinSig(sides: Seq[SourceSig],
                                   edges: Set[Set[(Int, String)]]) extends RegSig

  private final case class Entry(sig: RegSig,
                                 groupCols: Seq[String],
                                 aggs: Map[(String, String), String],
                                 mvRead: () => DataFrame,
                                 costThunk: () => Long) {
    /** Cost key when several MVs cover one query — the MV snapshot's
      * data BYTES from a directory listing, computed lazily and only
      * when a tie actually needs breaking. Strictly metadata: a
      * Catalyst rule must never launch a Spark job (a count would
      * execute a query during planning, and would re-run after every
      * REFRESH re-registration). */
    lazy val cost: Long = costThunk()
  }

  // keyed by MV root — registry is process-wide (table roots are
  // globally unique paths); values are tiny metadata
  private val entries = new ConcurrentHashMap[String, Entry]()

  /** Arm `mv` as the materialization of `SELECT groupCols, aggs FROM
    * source GROUP BY groupCols` at the source's CURRENT snapshot.
    * Multi-arm snapshots — schema generations from ADD COLUMN / type
    * widening, column-mapping projections from RENAME/DROP COLUMN, and
    * DV-bearing reads — register like plain scans; refused only when the
    * read decomposes to no recognizable graft scan shape at all. */
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
    val sig = decompose(snap.queryExecution.analyzed)
      .collect { case (s, Nil) => s }
      .getOrElse(sys.error("MV rewrite: source snapshot is not a " +
        s"recognizable graft scan shape at ${source.root} — registration " +
        "refused"))
    val mvCols = mv.read.columns.toSet
    val missing = (groupCols ++ aggs.map(_.mvCol)).filterNot(mvCols)
    require(missing.isEmpty,
      s"MV rewrite: MV at ${mv.root} lacks columns ${missing.mkString(",")}")
    entries.put(mv.root,
      Entry(ScanSig(sig), groupCols,
        aggs.map(a => (a.fn, a.col) -> a.mvCol).toMap, () => mv.read,
        // lazy byte size: the cost key when several registered MVs
        // cover one query (e.g. a fine (a,b) MV and a coarse (a) MV
        // both serve a GROUP BY a rollup — the coarse one reads fewer
        // bytes); metadata-only, and a stale size only mis-orders
        // candidates, both of which are exact
        () => mv.snapshotBytes))
  }

  /** Arm `mv` as the materialization of `SELECT groupCols, aggs FROM
    * left JOIN right ON <keys> GROUP BY groupCols` (INNER equi-join) at
    * the two sources' CURRENT (or pinned) snapshots — the gold-layer
    * fact⋈dim rollup shape. Freshness is structural on BOTH sides: a
    * commit to either table changes its snapshot signature and the MV
    * silently stops serving. Every column name the group/agg surface
    * references must be unambiguous across the two reads (present on
    * one side only, or a same-named key pair — value-equal under the
    * join), so the rewrite's name-based matching can never pick the
    * wrong side's column. */
  def registerJoin(left: VersionedTable, right: VersionedTable,
                   joinKeys: Seq[(String, String)], mv: VersionedTable,
                   groupCols: Seq[String], aggs: Seq[AggSpec],
                   leftVersion: Option[Long] = None,
                   rightVersion: Option[Long] = None): Unit =
    registerJoinChain(left, leftVersion,
      Seq(JoinDim(right, joinKeys, rightVersion)), mv, groupCols, aggs)

  /** One dim side of a chain registration: `keys` are (column on an
    * EARLIER side — the fact or a previously joined dim — , column on
    * this dim) pairs, the `JoinMv` star/snowflake build order. */
  final case class JoinDim(table: VersionedTable,
                           keys: Seq[(String, String)],
                           version: Option[Long] = None)

  /** [[registerJoin]] generalized to the star/snowflake chain: `fact
    * JOIN dim₁ ON keys₁ JOIN dim₂ ON keys₂ …` where each `lk` resolves
    * against the sides joined so far ([[graft.tables.JoinMv]]'s build
    * order). The stored signature is order-free (a side permutation +
    * key-equality partition), so any equivalent spelling of the same
    * join graph serves. */
  def registerJoinChain(fact: VersionedTable, factVersion: Option[Long],
                        dims: Seq[JoinDim], mv: VersionedTable,
                        groupCols: Seq[String], aggs: Seq[AggSpec]): Unit = {
    require(dims.nonEmpty && dims.forall(_.keys.nonEmpty),
      "MV rewrite: join registration needs keys on every dim")
    require(aggs.forall(a => Set("sum", "count", "min", "max")(a.fn)),
      s"MV rewrite: unsupported agg fn in ${aggs.map(_.fn).mkString(",")}")
    def sigOf(t: VersionedTable, v: Option[Long]): SourceSig =
      decompose(v.fold(t.read)(t.readVersion).queryExecution.analyzed)
        .collect { case (s, Nil) => s }
        .getOrElse(sys.error(s"MV rewrite: snapshot is not a " +
          s"recognizable graft scan shape at ${t.root} — registration " +
          "refused"))
    val sides = (fact, factVersion) +: dims.map(d => (d.table, d.version))
    val sideSigs = sides.map { case (t, v) => sigOf(t, v) }
    val sideCols: Seq[Set[String]] = sides.map(_._1.read.columns.toSet)
    // resolve each lk to the EARLIER side that carries it, building the
    // key-equality edge set. Several earlier carriers are fine only when
    // they are already key-connected (value-equal under the join) —
    // exactly the columns `JoinMv.joinOn` keeps one copy of.
    var edges = Set.empty[Set[(Int, String)]]
    def connected(a: (Int, String), b: (Int, String)): Boolean = {
      val classes = eqClasses(edges)
      classes.exists(c => c(a) && c(b))
    }
    dims.zipWithIndex.foreach { case (d, i) =>
      val s = i + 1
      d.keys.foreach { case (lk, rk) =>
        require(sideCols(s)(rk),
          s"MV rewrite: join key $rk missing from ${d.table.root}")
        val carriers = (0 until s).filter(j => sideCols(j)(lk))
        require(carriers.nonEmpty,
          s"MV rewrite: join key $lk missing from every earlier side")
        require(carriers.tail.forall(c =>
            connected((carriers.head, lk), (c, lk))),
          s"MV rewrite: join key `$lk` is carried by several earlier " +
            "sides that the join does not equate — ambiguous")
        edges += Set((carriers.head, lk), (s, rk))
      }
    }
    // a group/agg name on several sides is ambiguous unless every
    // carrier is key-connected (value-equal, either column serves)
    val keyClasses = eqClasses(edges)
    (groupCols ++ aggs.map(_.col).filter(_ != "*")).foreach { n =>
      val carriers = sideSigs.indices.filter(i => sideCols(i)(n))
      require(carriers.lengthCompare(1) <= 0 ||
          keyClasses.exists(c => carriers.forall(i => c((i, n)))),
        s"MV rewrite: column `$n` exists on several join sides — " +
          "ambiguous (only key-equated columns may repeat; alias one)")
    }
    val mvCols = mv.read.columns.toSet
    val missing = (groupCols ++ aggs.map(_.mvCol)).filterNot(mvCols)
    require(missing.isEmpty,
      s"MV rewrite: MV at ${mv.root} lacks columns ${missing.mkString(",")}")
    entries.put(mv.root,
      Entry(JoinSig(sideSigs, edges), groupCols,
        aggs.map(a => (a.fn, a.col) -> a.mvCol).toMap, () => mv.read,
        () => mv.snapshotBytes))
  }

  /** Transitive closure of the key-equality edges: the partition of
    * (side, column) nodes the join condition equates. */
  private def eqClasses(edges: Set[Set[(Int, String)]])
      : Set[Set[(Int, String)]] =
    edges.foldLeft(Set.empty[Set[(Int, String)]]) { (acc, e) =>
      val (touch, rest) = acc.partition(_.exists(e))
      rest + (touch.flatten ++ e)
    }

  def deregister(mv: VersionedTable): Unit = deregisterRoot(mv.root)

  /** Whether the table's snapshot decomposes to a registrable
    * [[SourceSig]] — plain, multi-arm, or DV-bearing. Callers use this to
    * skip registration quietly instead of catching the refusal (which
    * would also swallow genuine errors). */
  def isRegistrable(source: VersionedTable,
                    atVersion: Option[Long] = None): Boolean =
    decompose(atVersion.fold(source.read)(source.readVersion)
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

  /** Arm an already-built session (Verify/Bench/tests). Idempotent.
    * Installs the whole graft rule set — routing plus generated-column
    * partition-filter derivation. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    val add = Seq(this, GeneratedPrune, JoinElim).filterNot(cur.contains)
    if (add.nonEmpty)
      spark.experimental.extraOptimizations = cur ++ add
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val trace = explainTrace.get()
    if (trace != null) {
      // EXPLAIN REWRITE mode: record the decision for every Aggregate
      // exactly where the real rewrite would fire (same optimizer
      // position, same decomposition inputs), but leave the plan
      // untouched — an explain must not serve anything
      plan.foreachUp {
        case agg: Aggregate => traceAggregate(agg, trace)
        case _ => ()
      }
      plan
    } else if (entries.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }
  }

  private val explainTrace = new ThreadLocal[
    scala.collection.mutable.ArrayBuffer[(String, String, String, String)]]

  /** The active EXPLAIN REWRITE trace buffer (null outside trace mode).
    * Shared with [[JoinElim]] and [[GeneratedPrune]] so ONE decision
    * relation carries every graft optimizer rule's fire/no-fire
    * reasoning — the rules run in the same optimizer pass, so their
    * rows can never drift from what a genuine run would decide. */
  private[plans] def currentTrace
      : scala.collection.mutable.ArrayBuffer[(String, String, String, String)] =
    explainTrace.get()

  /** `EXPLAIN REWRITE` surface: the routing decision for every
    * Aggregate of the query with its reason — (aggregate label,
    * mv root, decision, reason) — without executing anything. Runs the
    * REAL optimizer with the rule in trace mode, so the report can
    * never drift from what a genuine run would decide. Decisions:
    * `served` (this MV answers the aggregate), `rejected` (covers the
    * snapshot but not this query surface, with why), `not-considered`
    * (a cheaper covering MV already serves), `shape-bail`,
    * `stale-fell-back` (an MV over the same table(s) is armed at a
    * DIFFERENT snapshot — refresh to re-arm), and `no-candidates`. */
  def explainRewrite(df: org.apache.spark.sql.DataFrame)
      : Seq[(String, String, String, String)] = {
    install(df.sparkSession) // idempotent; tracing needs the rule in place
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(String, String, String, String)]
    explainTrace.set(buf)
    try { df.queryExecution.optimizedPlan; () }
    finally explainTrace.remove()
    // the optimizer may run the user-rule batch more than once —
    // identical re-decisions dedup
    val rows = buf.distinct.toSeq
    if (rows.nonEmpty) rows
    else Seq(("", "", "no-decision",
      "no traced rule applies: MV routing serves Aggregate shapes, " +
        "join elimination needs a join over RELY-keyed graft tables, " +
        "generated-column pruning needs a filter over a table with " +
        "generated partition columns"))
  }

  private def traceAggregate(agg: Aggregate,
      out: scala.collection.mutable.ArrayBuffer[
        (String, String, String, String)]): Unit = {
    def rootOfPath(p: String): String = {
      val i = p.lastIndexOf(VersionedTable.DataDirMarker)
      if (i < 0) p else p.substring(0, i)
    }
    def rootsOf(sig: RegSig): Set[String] = sig match {
      case ScanSig(s) => s.totalPaths.map(rootOfPath)
      case JoinSig(sides, _) =>
        sides.flatMap(_.totalPaths.map(rootOfPath)).toSet
    }
    {
        val label =
          if (agg.groupingExpressions.isEmpty) "global"
          else agg.groupingExpressions.map(_.sql).mkString(",")
        if (entries.isEmpty)
          out += ((label, "", "no-candidates",
            "no materialized views are armed in this session"))
        else decomposeAny(agg.child) match {
          case None =>
            out += ((label, "", "shape-bail",
              "the aggregate's source is not a plain (filtered) read " +
                "of graft table snapshots, or an inner equi-join of " +
                "them, or carries expressions the decomposition refuses"))
          case Some(q)
              if !agg.groupingExpressions
                .forall(_.isInstanceOf[AttributeReference]) =>
            out += ((label, "", "shape-bail",
              "grouping expressions must be plain columns"))
          case Some(q) =>
            val groupAttrs = agg.groupingExpressions
              .map(_.asInstanceOf[AttributeReference])
            val covering = entries.asScala.toSeq
              .filter { case (_, e) => coversReg(e.sig, q.sig) }
            if (covering.isEmpty) {
              val qRoots = rootsOf(q.sig)
              val stale = entries.asScala
                .filter { case (_, e) =>
                  rootsOf(e.sig).exists(qRoots.contains) }
                .keys.toSeq.sorted
              if (stale.nonEmpty) stale.foreach(r =>
                out += ((label, r, "stale-fell-back",
                  "armed over a DIFFERENT snapshot of the same " +
                    "table(s) — the source moved since the MV's " +
                    "covered version; REFRESH MATERIALIZED VIEW " +
                    "re-arms it")))
              else
                out += ((label, "", "no-candidates",
                  "no armed MV reads this query's table(s)"))
            } else {
              val ordered =
                if (covering.sizeIs > 1) covering.sortBy(_._2.cost)
                else covering
              var served = false
              ordered.foreach { case (root, e) =>
                if (served)
                  out += ((label, root, "not-considered",
                    "a covering MV with fewer stored bytes already " +
                      "serves this aggregate"))
                else rewriteAgainst(agg, groupAttrs, q.filters, e) match {
                  case Some(_) =>
                    served = true
                    out += ((label, root, "served",
                      (if (agg.groupingExpressions.map(_.asInstanceOf[
                          AttributeReference].name).toSet ==
                          e.groupCols.toSet)
                        "exact group match — a projection of the MV"
                      else "group subset — re-aggregated rollup of " +
                        "the MV") +
                        (if (ordered.sizeIs > 1)
                          " (cheapest covering candidate)" else "")))
                  case None =>
                    val qGroups = groupAttrs.map(_.name).toSet
                    val mvGroups = e.groupCols.toSet
                    val why =
                      if (!qGroups.subsetOf(mvGroups))
                        "query groups by column(s) the MV does not " +
                          s"group by: ${(qGroups -- mvGroups).toSeq.sorted.mkString(",")}"
                      else if (!q.filters.forall(_.references
                          .forall(a => mvGroups(a.name))))
                        "a filter references non-group columns — row " +
                          "predicates cannot apply to pre-aggregated rows"
                      else
                        "the aggregate surface is not covered by the " +
                          "MV's stored aggregates (unsupported function, " +
                          "distinct/FILTER clause, or an expression the " +
                          "rewrite refuses)"
                    out += ((label, root, "rejected", why))
                }
              }
            }
        }
    }
    ()
  }

  // ------------------------------------------------- source decomposition

  /** Serialize one arm-output expression to a stable descriptor over the
    * arm's RELATION column names: plain column reads, widening casts,
    * null pads (columns added after the arm was written), literals, and
    * the two DV row-identity computations. Anything else — in particular
    * any arithmetic or function a USER projection would introduce —
    * returns None and the whole decomposition bails, so a query that
    * re-derives columns over the same files can never impersonate the
    * registered table read. */
  private def describe(e: Expression): Option[String] = e match {
    case a: AttributeReference =>
      Some(s"a:${a.name}:${a.dataType.catalogString}")
    case c: Cast =>
      describe(c.child).map(s => s"cast($s):${c.dataType.catalogString}")
    case Literal(null, dt) => Some(s"null:${dt.catalogString}")
    case l: Literal => Some(s"lit:${l.sql}")
    case SubstringIndex(g, Literal(m, _), Literal(-1, _))
        if metaField(g).contains("file_path") &&
          String.valueOf(m) == VersionedTable.DataDirMarker => Some("dvfile")
    case g if metaField(g).contains("row_index") => Some("dvpos")
    case _ => None
  }

  /** `_metadata.<field>` accessor → the field name. */
  private def metaField(e: Expression): Option[String] = e match {
    case gsf: GetStructField => gsf.child match {
      case a: AttributeReference if a.name == "_metadata" =>
        a.dataType match {
          case st: StructType => Some(st(gsf.ordinal).name)
          case _ => None
        }
      case _ => None
    }
    case _ => None
  }

  /** Fold one scan arm — Projects and Filters over exactly one parquet
    * relation — to (leaf root paths, output expressions rewritten over
    * the relation's own attributes, filter conditions likewise). */
  private def foldArm(p: LogicalPlan)
      : Option[(Set[String], Seq[Expression], Seq[Expression])] = p match {
    case l: LogicalRelation => l.relation match {
      case r: HadoopFsRelation =>
        Some((r.location.rootPaths.map(_.toString).toSet, l.output, Nil))
      case _ => None
    }
    case Project(list, child) => foldArm(child).flatMap {
      case (paths, childExprs, fs) =>
        val env = AttributeMap(child.output.zip(childExprs))
        val outs = list.map {
          case a: AttributeReference => env.get(a)
          case Alias(e, _) => Some(e.transform {
            case a: Attribute if env.contains(a) => env(a)
          })
          case _ => None
        }
        if (outs.forall(_.isDefined)) Some((paths, outs.flatten, fs))
        else None
    }
    case f: LFilter if f.condition.deterministic &&
        f.condition.find(_.isInstanceOf[PlanExpression[_]]).isEmpty =>
      foldArm(f.child).map { case (paths, childExprs, fs) =>
        val env = AttributeMap(f.child.output.zip(childExprs))
        (paths, childExprs, f.condition.transform {
          case a: Attribute if env.contains(a) => env(a)
        } +: fs)
      }
    case _ => None
  }

  /** Replace occurrences of per-arm source expressions in `cond` with
    * the corresponding logical output attribute — the inverse of the
    * optimizer pushing a logical predicate through an arm's projection.
    * None when anything remains bound to arm internals. */
  private def hoist(cond: Expression,
                    pairs: Seq[(Attribute, Expression)]): Option[Expression] = {
    val out = cond.transform {
      case e if pairs.exists(_._2.semanticEquals(e)) =>
        pairs.find(_._2.semanticEquals(e)).get._1
    }
    val logical = AttributeSet(pairs.map(_._1))
    if (out.references.subsetOf(logical)) Some(out) else None
  }

  /** Decompose the union-or-single-arm core of a graft read. Pushed-down
    * per-arm filters must hoist to the SAME logical predicate set in
    * every arm (they came from one predicate above the union). */
  private def decomposeCore(core: LogicalPlan)
      : Option[(SourceSig, Seq[Expression])] = {
    val armPlans = core match {
      case u: Union => u.children
      case other => Seq(other)
    }
    val outAttrs = core.output
    var arms = Map.empty[Set[String], Map[String, String]]
    var total = Set.empty[String]
    // hoisted filters: the RAW expressions of the first arm (usable for
    // name-based rewriting onto the MV) plus their canonical forms for
    // the must-agree-across-arms comparison
    var hoistedRaw: Seq[Expression] = Nil
    var hoistedCanon: Option[Set[Expression]] = None
    val it = armPlans.iterator
    while (it.hasNext) {
      val folded = foldArm(it.next())
      if (folded.isEmpty) return None
      val (paths, outExprs, armFs) = folded.get
      if (outExprs.size != outAttrs.size) return None
      val descs = outExprs.map(describe)
      if (descs.exists(_.isEmpty)) return None
      if (arms.contains(paths)) return None // ambiguous arm identity
      arms += paths -> outAttrs.map(_.name).zip(descs.flatten).toMap
      total ++= paths
      val pairs = outAttrs.zip(outExprs)
      val hs = armFs.map(hoist(_, pairs))
      if (hs.exists(_.isEmpty)) return None
      val hset: Set[Expression] = hs.flatten.map(_.canonicalized).toSet
      hoistedCanon match {
        case None => hoistedCanon = Some(hset); hoistedRaw = hs.flatten
        case Some(prev) => if (prev != hset) return None
      }
    }
    Some((SourceSig(total, arms), hoistedRaw))
  }

  /** `And`-conjunct split. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** The right side of the standard DV anti-join: the DV parquet scan
    * (possibly under a broadcast hint at analysis time, or an inferred
    * not-null filter after optimization — both semantics-preserving for
    * an anti-join's build side). */
  private def dvSide(p: LogicalPlan): Option[Set[String]] = p match {
    case h: ResolvedHint => dvSide(h.child)
    case f: LFilter if conjuncts(f.condition).forall {
      case IsNotNull(a: AttributeReference) =>
        a.name == VersionedTable.DvFileCol || a.name == VersionedTable.DvPosCol
      case _ => false
    } => dvSide(f.child)
    case l: LogicalRelation => l.relation match {
      case r: HadoopFsRelation
          if l.output.map(_.name).toSet ==
            Set(VersionedTable.DvFileCol, VersionedTable.DvPosCol) =>
        Some(r.location.rootPaths.map(_.toString).toSet)
      case _ => None
    }
    case _ => None
  }

  /** Decompose a plan into the graft-read shape: optional attr-only
    * Projects and hoistable Filters over [the standard DV anti-join
    * over] a union of projected arms or a single arm. Returns the
    * snapshot signature plus deterministic filter conditions expressed
    * over the read's logical output attributes. */
  private def decompose(p: LogicalPlan): Option[(SourceSig, Seq[Expression])] = p match {
    case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      decompose(c)
    case f: LFilter if f.condition.deterministic &&
        f.condition.find(_.isInstanceOf[PlanExpression[_]]).isEmpty =>
      decompose(f.child).map { case (sig, fs) => (sig, f.condition +: fs) }
    case h: ResolvedHint => decompose(h.child)
    case j: Join if j.joinType == LeftAnti && j.condition.isDefined =>
      for {
        dvPaths <- dvSide(j.right)
        (sig, fs) <- decompose(j.left)
        // the equated left columns must BE the table's DV row-identity
        // projections in every arm — never user-computed look-alikes
        if sig.arms.values.forall(m =>
          m.get(VersionedTable.DvFileCol).contains("dvfile") &&
            m.get(VersionedTable.DvPosCol).contains("dvpos"))
        cs = conjuncts(j.condition.get)
        if cs.size == 2 && Seq(VersionedTable.DvFileCol,
          VersionedTable.DvPosCol).forall(n => cs.exists {
            case EqualTo(a: AttributeReference, b: AttributeReference) =>
              a.name == n && b.name == n &&
                j.left.outputSet.contains(a) && j.right.outputSet.contains(b)
            case _ => false
          })
      } yield (SourceSig(sig.totalPaths ++ dvPaths,
        sig.arms + (dvPaths -> Map("__dv__" -> "dv"))), fs)
    case core @ (_: Union | _: Project | _: LogicalRelation | _: LFilter) =>
      decomposeCore(core)
    case _ => None
  }

  /** Does the registered signature cover the query's? Total paths and
    * arm partition must match exactly (freshness); per-arm descriptors
    * must AGREE on every column name both sides know. A query-side
    * column the registration has no name for is tolerated — it appears
    * when the optimizer prunes a rename projection away and the
    * relation's PHYSICAL column name resurfaces; if the aggregate
    * actually uses such a column, the rewrite stage bails by name
    * (groupCols/aggs/filters all resolve against the registered
    * surface), so tolerance here can never serve a wrong column. */
  private def covers(reg: SourceSig, q: SourceSig): Boolean =
    reg.totalPaths == q.totalPaths &&
      reg.arms.keySet == q.arms.keySet &&
      q.arms.forall { case (k, qm) =>
        val rm = reg.arms(k)
        qm.forall { case (n, d) => rm.get(n).forall(_ == d) }
      }

  /** Signature coverage lifted to the registration shapes. A join query
    * matches a join registration under ANY side permutation (inner
    * joins commute and associate) whose pairwise snapshots match and
    * whose key-equality partitions coincide after re-indexing — so
    * both side order and an equivalent-but-differently-spelled join
    * condition still serve. Side counts stay tiny (a star has a
    * handful of dims), so the permutation search is free. */
  private def coversReg(reg: RegSig, q: RegSig): Boolean = (reg, q) match {
    case (ScanSig(r), ScanSig(s)) => covers(r, s)
    case (JoinSig(rs, re), JoinSig(qs, qe)) =>
      rs.length == qs.length && rs.length <= 7 && {
        val regClasses = eqClasses(re)
        qs.indices.permutations.exists { perm =>
          rs.indices.forall(i => covers(rs(i), qs(perm(i)))) && {
            val remapped = qe.map(_.map {
              case (qi, n) => (perm.indexOf(qi), n)
            })
            eqClasses(remapped) == regClasses
          }
        }
      }
    case _ => false
  }

  /** The query-side shape: a snapshot read or an inner equi-join of two
    * snapshot reads, plus the hoisted deterministic filters. */
  private final case class QShape(sig: RegSig, filters: Seq[Expression])

  private def decomposeAny(p: LogicalPlan): Option[QShape] =
    decompose(p).map { case (s, fs) => QShape(ScanSig(s), fs) }
      .orElse(decomposeJoin(p))

  /** Decompose `Aggregate`'s child as an INNER equi-join TREE of graft
    * reads (two sides or a star/snowflake chain — any association
    * order the planner left it in). Join-key `IsNotNull` filters the
    * optimizer infers and pushes into the sides are DISCARDED — an
    * inner equi-join never matches null keys, so they cannot change
    * its result and the registered (filterless) join is identical.
    * Every other filter is kept and must later rewrite onto MV group
    * columns. */
  private def decomposeJoin(p: LogicalPlan): Option[QShape] = p match {
    case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      decomposeJoin(c)
    case h: ResolvedHint => decomposeJoin(h.child)
    case f: LFilter if f.condition.deterministic &&
        f.condition.find(_.isInstanceOf[PlanExpression[_]]).isEmpty =>
      decomposeJoin(f.child).map(q =>
        q.copy(filters = f.condition +: q.filters))
    case j: Join if j.joinType == Inner && j.condition.isDefined =>
      for {
        (sides, conds, sideFs) <- flattenJoin(j)
        sideOf = (a: Attribute) => sides.indexWhere(_._2.contains(a))
        // every join conjunct must equate columns of two DIFFERENT
        // leaf reads — anything else (non-equi, same-side, computed)
        // is not the registered shape
        edgeOpts = conds.map {
          case EqualTo(a: AttributeReference, b: AttributeReference)
              if sideOf(a) >= 0 && sideOf(b) >= 0 &&
                sideOf(a) != sideOf(b) =>
            Some(Set((sideOf(a), a.name), (sideOf(b), b.name)))
          case _ => None
        }
        if edgeOpts.forall(_.isDefined)
        edges = edgeOpts.flatten.toSet
        keyNodes = edges.flatten
        // conjunct-split BEFORE the key-IsNotNull drop: a pushed filter
        // arrives as one composite And (user predicate AND inferred
        // isnotnulls) and the key conjunct must not poison the rest
        kept = sideFs.flatMap(conjuncts).filterNot {
          case IsNotNull(a: AttributeReference) =>
            val s = sideOf(a); s >= 0 && keyNodes((s, a.name))
          case _ => false
        }
      } yield QShape(JoinSig(sides.map(_._1), edges), kept)
    case _ => None
  }

  /** Flatten a tree of INNER joins into its leaf graft reads (each with
    * the attribute set identifying which side a key belongs to), the
    * join-condition conjuncts, and the side filters hoisted by
    * [[decompose]]. Wrappers (attr-only Projects, hints, deterministic
    * Filters) between join nodes fold through. */
  private def flattenJoin(p: LogicalPlan)
      : Option[(Seq[(SourceSig, AttributeSet)],
                Seq[Expression], Seq[Expression])] = p match {
    case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      flattenJoin(c)
    case h: ResolvedHint => flattenJoin(h.child)
    case f: LFilter if f.condition.deterministic &&
        f.condition.find(_.isInstanceOf[PlanExpression[_]]).isEmpty =>
      flattenJoin(f.child).map { case (s, cs, fs) =>
        (s, cs, f.condition +: fs)
      }
    case j: Join if j.joinType == Inner && j.condition.isDefined =>
      for {
        (ls, lc, lf) <- flattenJoin(j.left).orElse(leafSide(j.left))
        (rs, rc, rf) <- flattenJoin(j.right).orElse(leafSide(j.right))
      } yield (ls ++ rs, lc ++ rc ++ conjuncts(j.condition.get), lf ++ rf)
    case _ => None
  }

  /** One leaf read of a join tree. The DV anti-join inside a graft read
    * is NOT an inner join, so [[decompose]] (not [[flattenJoin]])
    * absorbs it here. */
  private def leafSide(p: LogicalPlan)
      : Option[(Seq[(SourceSig, AttributeSet)],
                Seq[Expression], Seq[Expression])] =
    decompose(p).map { case (sig, fs) => (Seq((sig, p.outputSet)), Nil, fs) }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = for {
    q <- decomposeAny(agg.child)
    groupAttrs <- Some(agg.groupingExpressions).collect {
      case gs if gs.forall(_.isInstanceOf[AttributeReference]) =>
        gs.map(_.asInstanceOf[AttributeReference])
    }
    // several MVs can cover the same snapshot (different agg sets or
    // group granularities) — serve from the SMALLEST whose registered
    // surface covers this query (fewest MV bytes scanned; every
    // candidate is exact, so the cost pick cannot affect results).
    // The cost key is a lazy directory-listing byte sum — metadata
    // only, never a Spark job from inside the optimizer.
    candidates = entries.values.asScala.toSeq.filter(e =>
      coversReg(e.sig, q.sig))
    ordered = if (candidates.sizeIs > 1) candidates.sortBy(_.cost)
              else candidates
    plan <- ordered.view
      .flatMap(rewriteAgainst(agg, groupAttrs, q.filters, _)).headOption
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
      else LFilter(
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
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => MvRewrite)
    e.injectOptimizerRule(_ => GeneratedPrune)
    e.injectOptimizerRule(_ => JoinElim)
  }
}
