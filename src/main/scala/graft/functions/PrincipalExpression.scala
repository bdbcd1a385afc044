package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, LeafExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `current_principal()` — the session identity governed row filters and
  * column masks compare against (the engine's `current_user()` analog;
  * the reference's governance is UC-side, resources/uc/grants.sql).
  *
  * The expression is FOLDABLE and reads `spark.graft.principal` from the
  * live session `SQLConf` at fold time, so Catalyst's own
  * `ConstantFolding` collapses it to a string literal ON THE DRIVER,
  * PER QUERY EXECUTION. That is the whole design: a governed temp view
  * registers ONCE with the expression in its stored plan, and every
  * query through it re-binds the CURRENT principal at optimization
  * time — flip `spark.graft.principal` and the very next query sees the
  * new row-filter/mask policy, no re-registration. (The previous design
  * substituted the registration-time principal as literal text, so a
  * session that switched identity kept reading under the OLD policy
  * until it re-registered.)
  *
  * Unset or empty conf folds to NULL — a filter comparing against it
  * then matches nothing, deny-by-default. Folding always fires before
  * physical planning, so the expression never reaches an executor; if
  * some exotic path DID evaluate it there, `SQLConf.get` falls back to
  * defaults and yields NULL — fail-closed, never a stale identity.
  *
  * Caveat (inherent to foldable-at-optimization): a DataFrame object
  * built BEFORE a principal flip keeps its already-optimized plan;
  * `spark.sql(...)` plans fresh per call, which is how SQL readers
  * consume governed views. */
case class CurrentPrincipal() extends LeafExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def foldable: Boolean = true
  override def prettyName: String = "current_principal"

  override def eval(input: InternalRow): Any = {
    val p = SQLConf.get.getConfString(CurrentPrincipal.Conf, "")
    if (p == null || p.isEmpty) null else UTF8String.fromString(p)
  }
}

object CurrentPrincipal {
  /** The session-identity conf key (also `GraftSql.PrincipalConf`). */
  val Conf = "spark.graft.principal"

  /** Idempotently register `current_principal()` in the session's
    * function registry — required before parsing any row-filter/mask
    * text that references it, and before registering governed views. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val id = FunctionIdentifier("current_principal")
    if (!registry.functionExists(id)) {
      registry.registerFunction(id,
        new ExpressionInfo(classOf[CurrentPrincipal].getName,
          "current_principal"),
        (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
          // a policy author's `current_principal('admin')` must fail the
          // DDL loudly, not silently evaluate as the zero-arg function —
          // a governance predicate that means something other than what
          // was written is a leak
          require(args.isEmpty,
            s"current_principal takes no arguments (got ${args.length})")
          CurrentPrincipal()
        })
    }
    ()
  }
}
