package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.tables.VersionedTable

/** Join elimination from RELY key constraints (Databricks' informational
  * PRIMARY KEY / FOREIGN KEY optimization): when a query joins a fact to
  * a dim and then uses NO dim columns, the join is pure existence/
  * multiplicity plumbing — and declared keys decide it statically.
  *
  *  - LEFT join, dim side's RELY PRIMARY KEY covered by the equi-join
  *    columns → at most one match per fact row, no row is dropped or
  *    duplicated: the join IS the fact side. Dim-side filters and extra
  *    equalities only reduce matches below one — still exact.
  *  - INNER join, additionally the fact side declares a RELY FOREIGN
  *    KEY onto exactly those dim pk columns → every non-NULL fact key
  *    matches exactly once: the join is `fact WHERE fk IS NOT NULL`.
  *    Here the dim side must be UNFILTERED and the condition must be
  *    exactly the fk=pk equalities (anything else could drop fact rows).
  *
  * At 100 TB this removes a broadcast (or worse, shuffle) of the dim
  * and the hash probe per fact row from queries that only aggregate
  * fact columns — the BI-tool shape (`SELECT fact aggregates FROM
  * fact JOIN dims…` with column pruning leaving the dims unused).
  *
  * Soundness rests on the DECLARED constraints: keys are informational
  * and `RELY` marks the user's assertion trusted for optimization —
  * identical to Databricks, where a false RELY likewise yields wrong
  * results. Non-RELY keys never fire. Equated columns must resolve
  * through pass-through projections to the scan's own attributes (an
  * aliased impersonation — `SELECT v AS k` — never matches), and both
  * sides must decompose to single-relation scans under registered
  * roots, so same-named columns of unrelated tables cannot fire. */
object JoinElim extends Rule[LogicalPlan] {

  private final case class Keys(
      pk: Option[(Seq[String], Boolean)],
      fks: Seq[(Seq[String], String, Seq[String], Boolean)])

  private val registry = new ConcurrentHashMap[String, Keys]()

  private def norm(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  /** (Re-)register `t`'s declared keys — called by every snapshot read
    * (one stat when the table declares none). */
  def arm(t: VersionedTable): Unit = {
    if (t.keyConstraints.isEmpty) { registry.remove(norm(t.root)); return }
    registry.put(norm(t.root), Keys(
      t.primaryKey.map(p => (p._2, p._3)),
      t.foreignKeys.map(f => (f._2, norm(f._3), f._4, f._5))))
    ()
  }

  def deregisterRoot(root: String): Unit = { registry.remove(norm(root)); () }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val trace = MvRewrite.currentTrace
    if (trace != null) {
      // EXPLAIN REWRITE mode: record the fire/no-fire decision for every
      // join this rule would inspect, leave the plan untouched. Only
      // joins whose dim side resolves to a registered RELY-keyed graft
      // table report — an unregistered join is out of this rule's
      // jurisdiction, not a decision about it.
      plan.foreachUp {
        case Project(ps, j: Join) =>
          traceJoin(j, ps.flatMap(_.references), trace)
        case Aggregate(gs, as, j: Join, _) =>
          traceJoin(j, (gs ++ as).flatMap(_.references), trace)
        case _ => ()
      }
      plan
    } else if (registry.isEmpty) plan
    else plan.transformUp {
      case p @ Project(ps, j: Join) =>
        tryElim(j, ps.flatMap(_.references)).map(c => p.copy(child = c))
          .getOrElse(p)
      case a @ Aggregate(gs, as, j: Join, _) =>
        tryElim(j, (gs ++ as).flatMap(_.references))
          .map(c => a.copy(child = c)).getOrElse(a)
    }
  }

  private def traceJoin(j: Join, needed: Seq[Attribute],
      out: scala.collection.mutable.ArrayBuffer[
        (String, String, String, String)]): Unit = decide(j, needed) match {
    case scala.Right((root, _, why)) =>
      out += (("join", root, "join-eliminated", why)); ()
    case scala.Left((root, why)) if root.nonEmpty =>
      out += (("join", root, "join-kept", why)); ()
    case _ => () // dim side not a registered keyed table: no decision
  }

  /** Chain walk: (relation root, relation, Filter conjuncts seen). */
  private def chainRoot(p: LogicalPlan, seen: Seq[Expression])
      : Option[(String, LogicalRelation, Seq[Expression])] =
    p match {
      case l: LogicalRelation => l.relation match {
        case r: HadoopFsRelation =>
          val roots = r.location.rootPaths.map(x => norm(x.toString))
          var hit: Option[String] = None
          val it = registry.keySet().iterator()
          while (it.hasNext && hit.isEmpty) {
            val k = it.next()
            if (roots.nonEmpty && roots.forall(_.startsWith(k + "/")))
              hit = Some(k)
          }
          hit.map((_, l, seen))
        case _ => None
      }
      case Project(_, c) => chainRoot(c, seen)
      case Filter(f, c)  => chainRoot(c, seen ++ splitAnd(f))
      case _ => None
    }

  /** Resolve `a` through pass-through projections to the RELATION's own
    * attribute name — bails on any computed alias, so a column
    * impersonating another never matches a declared key. */
  private def relName(p: LogicalPlan, a: Attribute): Option[String] =
    p match {
      case l: LogicalRelation =>
        l.output.find(_.exprId == a.exprId).map(_.name)
      case Project(list, c) =>
        list.collectFirst {
          case al @ Alias(ar: AttributeReference, _)
            if al.exprId == a.exprId => ar
          case ar: AttributeReference if ar.exprId == a.exprId => ar
        }.flatMap(relName(c, _))
      case Filter(_, c) => relName(c, a)
      case _ => None
    }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case x => Seq(x)
  }

  private def tryElim(j: Join, needed: Seq[Attribute]): Option[LogicalPlan] =
    decide(j, needed).toOption.map(_._2)

  /** The elimination decision WITH its reasoning — one copy of the
    * soundness logic serving both the rewrite ([[tryElim]]) and the
    * EXPLAIN REWRITE trace. Right((dim root, replacement, why fired));
    * Left((dim root, why kept)) — root is "" when the dim side never
    * resolved to a registered keyed table (no jurisdiction, no row). */
  private def decide(j: Join, needed: Seq[Attribute])
      : Either[(String, String), (String, LogicalPlan, String)] = {
    // resolve the dim root FIRST so even early structural bails can
    // attribute their reason to the table whose keys are in play
    val rootOpt = chainRoot(j.right, Nil)
    val rRoot = rootOpt.map(_._1).filter(r => registry.containsKey(r))
      .getOrElse("")
    def kept(why: String) = scala.Left((rRoot, why))
    if (j.joinType != Inner && j.joinType != LeftOuter)
      return kept("only INNER and LEFT OUTER joins are eliminable")
    val leftOut = AttributeSet(j.left.output)
    val rightOut = AttributeSet(j.right.output)
    if (needed.exists(rightOut.contains))
      return kept("the query uses dim-side columns — the join is not " +
        "pure existence/multiplicity plumbing")
    val cond = j.condition.getOrElse(
      return kept("the join has no condition"))
    // every conjunct must be a left-attr = right-attr equality
    val pairsOpt = splitAnd(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
        if leftOut.contains(a) && rightOut.contains(b) => Some((a, b))
      case EqualTo(b: AttributeReference, a: AttributeReference)
        if leftOut.contains(a) && rightOut.contains(b) => Some((a, b))
      case _ => None
    }
    if (pairsOpt.exists(_.isEmpty) || pairsOpt.flatten.isEmpty)
      return kept("the join condition is not a conjunction of " +
        "left-column = right-column equalities")
    val pairs = pairsOpt.flatten
    val (rRootHit, _, rFilters) = rootOpt
      .getOrElse(return scala.Left(("", "dim side is not a graft table scan")))
    val rKeys = registry.get(rRootHit)
    if (rKeys == null)
      return scala.Left(("", "dim side declares no RELY keys"))
    val pk = rKeys.pk.filter(_._2).map(_._1).getOrElse(
      return kept("dim side declares no RELY PRIMARY KEY"))
    // right-side equated columns, resolved to the scan's own names
    val rNames = pairs.map(p => relName(j.right, p._2))
    if (rNames.exists(_.isEmpty))
      return kept("an equated dim column is a computed alias, not the " +
        "scan's own attribute")
    val equatedRight = rNames.flatten
    if (!pk.forall(equatedRight.contains))
      return kept("the equi-join columns do not cover the dim's RELY " +
        s"PRIMARY KEY (${pk.mkString(",")}) — matches may duplicate rows")
    j.joinType match {
      case LeftOuter =>
        // ≤1 match per left row and LEFT keeps every left row: the
        // join is the left side verbatim (right filters only reduce
        // match count — still ≤1)
        scala.Right((rRootHit, j.left,
          "LEFT join to a RELY PRIMARY KEY covered by the equi-join " +
            "columns with no dim column used — at most one match per " +
            "row and every left row kept: the join is the left side"))
      case Inner =>
        // exact-once semantics need the FK story: a dim filter can drop
        // matches — EXCEPT `IsNotNull(pk col)` (the optimizer infers it
        // from the join condition; a NULL pk never matched anyway) —
        // and the condition must be exactly the fk=pk pairs
        val harmless = rFilters.forall {
          case IsNotNull(a: AttributeReference) =>
            relName(j.right, a).exists(pk.contains)
          case _ => false
        }
        if (!harmless)
          return kept("INNER join with a dim-side filter — filtered " +
            "dims can drop fact rows, so exactly-once is not provable")
        if (equatedRight.toSet != pk.toSet)
          return kept("INNER join condition carries equalities beyond " +
            "the fk=pk pairs — extra terms could drop fact rows")
        val (lRoot, _, _) = chainRoot(j.left, Nil).getOrElse(
          return kept("fact side is not a graft table scan — no " +
            "FOREIGN KEY to consult"))
        val lKeys = registry.get(lRoot)
        if (lKeys == null)
          return kept("fact side declares no keys — an INNER join " +
            "needs a RELY FOREIGN KEY onto the dim's PRIMARY KEY")
        val aligned = lKeys.fks.exists { case (fcols, refRoot, refCols, rely) =>
          rely && refRoot == rRootHit && refCols.toSet == pk.toSet &&
            pairs.forall { case (la, rb) =>
              (relName(j.left, la), relName(j.right, rb)) match {
                case (Some(ln), Some(rn)) =>
                  fcols.zip(refCols).contains((ln, rn))
                case _ => false
              }
            }
        }
        if (!aligned)
          kept("fact side declares no RELY FOREIGN KEY aligned onto " +
            "the dim's PRIMARY KEY along the join columns")
        // non-NULL fact keys match exactly once; NULL keys never match
        else scala.Right((rRootHit, Filter(pairs.map(_._1).distinct
          .map(IsNotNull(_): Expression).reduce(And(_, _)), j.left),
          "INNER join on a RELY FOREIGN KEY onto the dim's RELY " +
            "PRIMARY KEY with no dim column used — every non-NULL " +
            "fact key matches exactly once: the join is the fact side " +
            "filtered to non-NULL keys"))
      case _ => kept("unreachable join type")
    }
  }
}
