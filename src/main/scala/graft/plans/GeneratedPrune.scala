package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._

import graft.tables.VersionedTable

/** Partition pruning THROUGH generated columns (Delta's generated-column
  * partition-filter optimization): a table `PARTITIONED BY (day)` with
  * `day GENERATED ALWAYS AS (substring(ts, 1, 10))` should prune
  * partitions for `WHERE ts >= '2026-01-02'` even though the predicate
  * never mentions `day` — at 100 TB the difference between scanning one
  * day and scanning the table. The write path enforces `gen = f(src)`
  * row-wise (inconsistent supplied values are refused), which makes
  * derived predicates sound:
  *
  *  - `src = L`      ⇒ `gen = f(L)`            (any deterministic f)
  *  - `src IN (…)`   ⇒ `gen IN (f(…))`         (any deterministic f)
  *  - `src ≥/> L`    ⇒ `gen ≥ f(L)`            (monotone f only)
  *  - `src ≤/< L`    ⇒ `gen ≤ f(L)`            (monotone f only)
  *
  * Monotone shapes are whitelisted — fixed-length string prefixes
  * (`substring(src, 1, n)`: lexicographic order is prefix-monotone) and
  * the calendar family over date/timestamp (`CAST(src AS DATE)`,
  * `year`, `date_trunc`, `trunc`, `to_date`) — everything else derives
  * equality/IN only. Derivation is conjunct-level: only top-level AND
  * terms of the shape `src cmp literal` contribute, so OR-embedded
  * predicates never derive (they imply nothing row-wise).
  *
  * The derived Filter is inserted DIRECTLY ABOVE the scan relation —
  * below any column-pruned Project, so it works when the query never
  * selects the generated column at all — where `FileSourceStrategy`
  * lifts partition-column predicates into PartitionFilters (directory
  * pruning, zero data IO for pruned partitions).
  *
  * Registration is path-keyed (like [[MvRewrite]]): [[arm]] runs on
  * every graft snapshot read (one `stat` when the table declares no
  * generated columns) and records root → specs; the rule matches only
  * Project/Filter chains over ONE parquet relation whose every root
  * path lies under a registered table root, so same-named columns of
  * unrelated tables can never derive. Conservative by construction:
  * a shape this rule does not recognize is simply left unpruned. */
object GeneratedPrune extends Rule[LogicalPlan] {

  /** One armed generated column: `gen = template(src)` with `template`
    * a resolved, deterministic, single-attribute expression. */
  private final case class GenSpec(genCol: String, srcCol: String,
                                   srcType: DataType, genType: DataType,
                                   template: Expression, monotone: Boolean)

  // root path (scheme-stripped, no trailing slash) → specs
  private val registry = new ConcurrentHashMap[String, Seq[GenSpec]]()

  private def norm(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  /** (Re-)register `t`'s generated PARTITION columns from a snapshot
    * read `df`. Called by every snapshot read; cheap when the table
    * declares no generated columns. Only columns that are BOTH
    * generated and part of the physical partition layout arm — a
    * derived predicate on a non-partition column would be correct but
    * useless. */
  def arm(t: VersionedTable, df: DataFrame): Unit = {
    val gens = t.generatedColumns
    if (gens.isEmpty) { registry.remove(norm(t.root)); return }
    val parts = (t.partitionLayout ++
      t.bucketSpec.map(_.partitionKeys).getOrElse(Nil)).toSet
    val specs = gens.filter(g => parts(g._1)).flatMap { case (gcol, gexpr) =>
      scala.util.Try {
        // resolve the generation expression against the live snapshot:
        // casts pick up the session time zone, functions resolve to
        // real expression classes (the whitelist matches classes, not
        // SQL text)
        val analyzed = df.selectExpr(s"($gexpr) AS __g")
          .queryExecution.analyzed
        analyzed.collectFirst {
          case Project(Seq(Alias(e, "__g")), _) => e
        }.flatMap { template =>
          val refs = template.references.toSeq
          if (refs.length == 1 && template.deterministic)
            Some(GenSpec(gcol, refs.head.name, refs.head.dataType,
              template.dataType, template, isMonotone(template)))
          else None
        }
      }.toOption.flatten
    }
    if (specs.nonEmpty) { registry.put(norm(t.root), specs); () }
    else { registry.remove(norm(t.root)); () }
  }

  def deregisterRoot(root: String): Unit = { registry.remove(norm(root)); () }

  /** Whitelisted order-preserving shapes over the single source attr. */
  private def isMonotone(e: Expression): Boolean = e match {
    case a: AttributeReference => true // identity (gen = src)
    case s: Substring => s.str.isInstanceOf[AttributeReference] &&
      s.str.dataType == StringType &&
      s.pos.foldable && s.pos.eval() == 1 && s.len.foldable
    case c: Cast if c.dataType == DateType || c.dataType == TimestampType ||
        c.dataType == TimestampNTZType =>
      isMonotone(c.child) && (c.child.dataType == DateType ||
        c.child.dataType == TimestampType ||
        c.child.dataType == TimestampNTZType)
    case y: Year => isMonotone(y.child)
    case td: TruncDate => td.format.foldable && isMonotone(td.date)
    case tt: TruncTimestamp => tt.format.foldable && isMonotone(tt.timestamp)
    // to_date over STRING is NOT monotone: Spark's lenient parser accepts
    // non-canonical forms ('2026-1-5') whose lexicographic order disagrees
    // with their date order, so a range derived from the string comparison
    // could prune a partition that holds matching rows. Only date/timestamp
    // sources (where to_date is a calendar truncation) derive ranges;
    // string sources still get equality/IN derivation.
    case pd: ParseToDate if pd.format.isEmpty =>
      isMonotone(pd.left) && (pd.left.dataType == DateType ||
        pd.left.dataType == TimestampType ||
        pd.left.dataType == TimestampNTZType)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val trace = MvRewrite.currentTrace
    if (trace != null) {
      // EXPLAIN REWRITE mode: report, per filtered scan of a table with
      // generated partition columns, whether a partition predicate
      // derives (and which) or why not — plan untouched. Unregistered
      // scans are out of jurisdiction and emit nothing.
      plan.foreachUp {
        case Filter(cond, child) => traceDerive(cond, child, trace)
        case _ => ()
      }
      plan
    } else if (registry.isEmpty) plan
    else plan.transformUp {
      case f @ Filter(cond, child) =>
        tryDerive(cond, child).map(d => f.copy(child = d)).getOrElse(f)
    }
  }

  private def traceDerive(cond: Expression, child: LogicalPlan,
      out: scala.collection.mutable.ArrayBuffer[
        (String, String, String, String)]): Unit =
    chainToRel(child, Nil).foreach { case (rel, root, specs, chainSeen) =>
      deriveConjuncts(cond, rel, specs, chainSeen) match {
        case derived if derived.nonEmpty =>
          out += (("scan", root, "partition-pruned",
            "derived partition filter " +
              derived.map(_.sql).mkString(" AND ") +
              " through the generated-column contract — directory " +
              "pruning instead of a data scan"))
          ()
        case _ =>
          out += (("scan", root, "prune-none",
            "no top-level AND conjunct has the shape <source column> " +
              "cmp literal that derives through the generation " +
              "expression (range shapes need a monotone template), or " +
              "the derived predicate is already present"))
          ()
      }
    }

  /** Walk a Project/Filter chain to its single parquet relation; return
    * (relation, registered root, its specs, the chain's existing Filter
    * conjuncts — the idempotence set). */
  private def chainToRel(p: LogicalPlan, seen: Seq[Expression])
      : Option[(LogicalRelation, String, Seq[GenSpec], Seq[Expression])] =
    p match {
    case l: LogicalRelation => l.relation match {
      case r: HadoopFsRelation =>
        val roots = r.location.rootPaths.map(x => norm(x.toString))
        val reg = registry.entrySet().iterator()
        var hit: Option[(String, Seq[GenSpec])] = None
        while (reg.hasNext && hit.isEmpty) {
          val e = reg.next()
          if (roots.nonEmpty &&
              roots.forall(_.startsWith(e.getKey + "/")))
            hit = Some((e.getKey, e.getValue))
        }
        hit.map { case (k, s) => (l, k, s, seen) }
      case _ => None
    }
    case Project(_, c) => chainToRel(c, seen)
    case Filter(c, ch) =>
      chainToRel(ch, seen ++ splitAnd(c))
    case _ => None
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case x => Seq(x)
  }

  /** Apply the template to a comparison literal: substitute and
    * constant-fold; cast to the partition column's (possibly inferred)
    * type when it differs — ISO-formatted strings keep their order
    * through that cast, and a failed cast skips the conjunct. */
  private def foldThrough(spec: GenSpec, lit: Literal,
                          genAttr: Attribute): Option[Literal] = {
    if (lit.value == null || lit.dataType != spec.srcType) return None
    scala.util.Try {
      val sub = spec.template.transform {
        case _: AttributeReference => lit
      }
      val v = sub.eval(null)
      if (v == null) None
      else if (spec.genType == genAttr.dataType)
        Some(Literal.create(v, spec.genType))
      else {
        // session time zone, not JVM default: arm() resolved the template
        // under the session TZ, so the boundary cast must agree or
        // timestamp/date literals shift by a day and mis-prune
        val sessionTz = org.apache.spark.sql.internal.SQLConf.get
          .sessionLocalTimeZone
        val c = Cast(Literal.create(v, spec.genType), genAttr.dataType,
          Some(sessionTz)).eval(null)
        if (c == null) None else Some(Literal.create(c, genAttr.dataType))
      }
    }.toOption.flatten
  }

  private def tryDerive(cond: Expression,
                        child: LogicalPlan): Option[LogicalPlan] = {
    val (rel, _, specs, chainSeen) = chainToRel(child, Nil) match {
      case Some(x) => x
      case None => return None
    }
    val derived = deriveConjuncts(cond, rel, specs, chainSeen)
    if (derived.isEmpty) None
    else {
      val pred = derived.reduce(And(_, _))
      // insert directly above the relation: below pruned Projects (the
      // generated column need not survive to the query's output) and
      // where FileSourceStrategy lifts it into PartitionFilters
      Some(child.transformUp {
        case r: LogicalRelation if r eq rel => Filter(pred, r)
      })
    }
  }

  /** The derivable partition-predicate conjuncts of `cond` against one
    * registered relation — shared by the rewrite and the EXPLAIN
    * REWRITE trace so the report can never drift from the rule. */
  private def deriveConjuncts(cond: Expression, rel: LogicalRelation,
                              specs: Seq[GenSpec],
                              chainSeen: Seq[Expression]): Seq[Expression] = {
    val conjuncts = splitAnd(cond)
    val seen = conjuncts ++ chainSeen
    specs.flatMap { spec =>
      // the source column as the QUERY references it (logical name at
      // the Filter's scope) and the generated PARTITION column as the
      // relation carries it (partition-schema attribute)
      val genAttr = rel.output.find(_.name.equalsIgnoreCase(spec.genCol))
      genAttr.toSeq.flatMap { g =>
        def f(l: Literal): Option[Literal] = foldThrough(spec, l, g)
        def isSrc(e: Expression): Boolean = e match {
          case a: AttributeReference => a.name.equalsIgnoreCase(spec.srcCol)
          case _ => false
        }
        conjuncts.flatMap {
          case EqualTo(a, l: Literal) if isSrc(a) =>
            f(l).map(EqualTo(g, _))
          case EqualTo(l: Literal, a) if isSrc(a) =>
            f(l).map(EqualTo(g, _))
          case In(a, ls) if isSrc(a) && ls.forall(_.isInstanceOf[Literal]) =>
            val vs = ls.map(l => f(l.asInstanceOf[Literal]))
            if (vs.forall(_.isDefined)) Some(In(g, vs.flatten.distinct))
            else None
          case GreaterThan(a, l: Literal) if isSrc(a) && spec.monotone =>
            f(l).map(GreaterThanOrEqual(g, _))
          case GreaterThanOrEqual(a, l: Literal) if isSrc(a) && spec.monotone =>
            f(l).map(GreaterThanOrEqual(g, _))
          case LessThan(a, l: Literal) if isSrc(a) && spec.monotone =>
            f(l).map(LessThanOrEqual(g, _))
          case LessThanOrEqual(a, l: Literal) if isSrc(a) && spec.monotone =>
            f(l).map(LessThanOrEqual(g, _))
          case LessThan(l: Literal, a) if isSrc(a) && spec.monotone =>
            f(l).map(GreaterThanOrEqual(g, _))
          case LessThanOrEqual(l: Literal, a) if isSrc(a) && spec.monotone =>
            f(l).map(GreaterThanOrEqual(g, _))
          case GreaterThan(l: Literal, a) if isSrc(a) && spec.monotone =>
            f(l).map(LessThanOrEqual(g, _))
          case GreaterThanOrEqual(l: Literal, a) if isSrc(a) && spec.monotone =>
            f(l).map(LessThanOrEqual(g, _))
          case _ => None
        }
      }
    }.filterNot(d => seen.exists(_.semanticEquals(d)))
  }
}
