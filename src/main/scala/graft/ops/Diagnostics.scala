package graft.ops

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.{AccumulatorV2, LongAccumulator}

/** Observability for silent-data-loss guards.
  *
  * Blocking-based pair generators ([[Dedup.pairsWithinGroups]]) cap group
  * size to bound the O(n²) in-group expansion — but a capped group is
  * DROPPED, i.e. recall silently lost. [[Diagnostics.sizeCapFilter]] makes
  * the cap filter itself the probe: a custom expression that evaluates the
  * usual `size BETWEEN min AND cap` predicate and, as it runs, feeds two
  * Spark accumulators (groups dropped, largest group seen) and WARN-logs
  * the first drop per partition.
  *
  * Accumulators — not `Dataset.observe` — on purpose: observed metrics are
  * read back by scanning the FINAL physical plan for CollectMetrics nodes,
  * and AQE's empty-relation propagation can collapse an already-executed
  * subtree out of that plan (e.g. every candidate pair was capped away →
  * join side empty → CollectMetrics node eliminated → metric silently
  * vanishes in exactly the catastrophic all-dropped case). Accumulator
  * updates merge at task completion regardless of what the final plan
  * looks like. Values are cumulative across actions and task retries —
  * treat them as "nonzero = recall was lost", not an exact per-run count. */
object Diagnostics {

  /** Grows-only max accumulator (group sizes are nonnegative). */
  final class MaxAccumulator extends AccumulatorV2[java.lang.Long, java.lang.Long] {
    private var _max = 0L
    override def isZero: Boolean = _max == 0L
    override def copy(): MaxAccumulator = {
      val a = new MaxAccumulator; a._max = _max; a
    }
    override def reset(): Unit = _max = 0L
    override def add(v: java.lang.Long): Unit = _max = math.max(_max, v)
    override def merge(o: AccumulatorV2[java.lang.Long, java.lang.Long]): Unit =
      _max = math.max(_max, o.value)
    override def value: java.lang.Long = _max
  }

  final case class DropStats(dropped: LongAccumulator, largest: MaxAccumulator)

  private val stats = new ConcurrentHashMap[String, DropStats]()
  private val names = new AtomicLong()

  /** Latest (droppedGroups, largestGroup) totals across probes whose name
    * starts with `prefix` (probe names are uniquified per call site). */
  def lastDrops(prefix: String): Option[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    stats.asScala.collect {
      case (k, v) if k.startsWith(prefix) =>
        (v.dropped.value.longValue(), v.largest.value.longValue())
    }.reduceOption((a, b) => (a._1 + b._1, math.max(a._2, b._2)))
  }

  /** Reset probes matching `prefix` (test isolation). */
  def resetDrops(prefix: String): Unit = {
    import scala.jdk.CollectionConverters._
    stats.asScala.collect { case (k, v) if k.startsWith(prefix) => v }
      .foreach { s => s.dropped.reset(); s.largest.reset() }
  }

  /** `df.filter(sizeCol BETWEEN minSize AND cap)` with loss accounting:
    * rows over `cap` are dropped AND counted (see object doc). `sizeCol`
    * must be long-valued; `tag` namespaces the probe for [[lastDrops]]. */
  def sizeCapFilter(df: DataFrame, sizeCol: Column, minSize: Int, cap: Int,
                    tag: String): DataFrame = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val name = s"graft_drops_${tag}_${names.incrementAndGet()}"
    val d = new LongAccumulator
    val l = new MaxAccumulator
    sc.register(d, s"$name.dropped_groups")
    sc.register(l, s"$name.largest_group")
    stats.put(name, DropStats(d, l))
    // the probe carries accumulator references, so it can't go through a
    // shared function name — register a per-probe builder (bounded: the
    // registrar evicts old probes AND their stats entries)
    graft.functions.TransientFunctions.register(spark, "graft_drops", name,
      classOf[SizeCapProbe],
      (exprs: Seq[Expression]) =>
        SizeCapProbe(exprs.head, minSize, cap, name, d, l),
      onEvict = stats.remove(_))
    df.filter(call_function(name, sizeCol))
  }

  /** Complement of [[sizeCapFilter]] for the anti-join pruning shape
    * ([[Dedup.hammingPairs]]): returns the rows whose size EXCEEDS `cap` —
    * the (tiny by construction) set of degenerate groups the caller
    * broadcasts and anti-joins away — with the same drop accounting: each
    * oversized group counts as dropped, `largest` tracks every group seen,
    * and the first drop per partition WARN-logs. */
  def oversizeFilter(df: DataFrame, sizeCol: Column, cap: Int,
                     tag: String): DataFrame = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val name = s"graft_drops_${tag}_${names.incrementAndGet()}"
    val d = new LongAccumulator
    val l = new MaxAccumulator
    sc.register(d, s"$name.dropped_groups")
    sc.register(l, s"$name.largest_group")
    stats.put(name, DropStats(d, l))
    graft.functions.TransientFunctions.register(spark, "graft_drops", name,
      classOf[SizeCapProbe],
      (exprs: Seq[Expression]) =>
        SizeCapProbe(exprs.head, 0, cap, name, d, l),
      onEvict = stats.remove(_))
    // with minSize = 0 the probe is exactly `size <= cap`, so its negation
    // keeps precisely the oversized groups while the probe's side effects
    // still count them as drops
    df.filter(!call_function(name, sizeCol))
  }
}

/** The probe predicate: `minSize <= size <= cap`, accumulating drop stats
  * as a side effect. Nondeterministic so the optimizer never folds,
  * duplicates, or reorders it away from the row stream it audits. */
case class SizeCapProbe(child: Expression, minSize: Long, cap: Long,
                        name: String, dropped: LongAccumulator,
                        largest: Diagnostics.MaxAccumulator)
  extends UnaryExpression with Nondeterministic with CodegenFallback {

  @transient private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)
  @transient private var warnedThisPartition = false

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override protected def initializeInternal(partitionIndex: Int): Unit =
    warnedThisPartition = false

  override protected def evalInternal(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else {
      val n = v.asInstanceOf[Number].longValue()
      largest.add(n)
      if (n > cap) {
        dropped.add(1L)
        if (!warnedThisPartition) {
          warnedThisPartition = true
          log.warn(s"$name: group of size $n exceeds cap $cap and is " +
            "DROPPED from pair generation — recall is reduced; raise " +
            "maxGroupSize or tighten the blocking key")
        }
        false
      } else n >= minSize
    }
  }

  override protected def withNewChildInternal(newChild: Expression): SizeCapProbe =
    copy(child = newChild)
}
