package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bounded per-call function registration.
  *
  * Some operators need an expression carrying a RUNTIME PAYLOAD (a Bloom
  * filter, accumulators, quantile cuts) — those register a uniquely-named
  * builder per invocation (the payload rides the closure). Left alone,
  * a long-lived session running such operators in a loop would grow the
  * FunctionRegistry (and the captured payloads) without bound. This
  * registrar keeps the last [[MaxPerPrefix]] registrations per (session,
  * prefix) and drops the eldest beyond that.
  *
  * Dropping is safe for plans already built: `call_function` resolves at
  * ANALYSIS time (Dataset construction), so a DataFrame created by the
  * operator holds the expression instance itself — executing it later
  * does not consult the registry again. */
object TransientFunctions {

  private val MaxPerPrefix = 64
  private val history = new ConcurrentHashMap[String, java.util.ArrayDeque[String]]()

  /** Register `builder` under `name` (must be unique; callers append a
    * counter) and evict the eldest same-prefix registration beyond the
    * cap. `onEvict` lets callers free side-state keyed by the name. */
  def register(spark: SparkSession, prefix: String, name: String,
               exprClass: Class[_],
               builder: Seq[Expression] => Expression,
               onEvict: String => Unit = _ => ()): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo(exprClass.getName, name),
      builder)
    val key = s"${System.identityHashCode(spark)}:$prefix"
    val q = history.computeIfAbsent(key, _ => new java.util.ArrayDeque[String]())
    q.synchronized {
      q.addLast(name)
      while (q.size > MaxPerPrefix) {
        val evicted = q.removeFirst()
        registry.dropFunction(FunctionIdentifier(evicted))
        onEvict(evicted)
      }
    }
  }
}
