package graft.ops

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-prefiltered semi join — explicit runtime-filter pushdown.
  *
  * The build side's join keys are folded into a Bloom filter (driver-side
  * sketch — ~1.2 MB for 1M keys at 1% fpp, same shape as Spark's own
  * InSubquery broadcast), which becomes a map-side predicate on the probe
  * side BEFORE the exact semi join. At 100 TB the payoff is shuffle
  * elimination: the probe scan discards ~(1-fpp) of non-matching rows in
  * the scan stage, so the semi join shuffles only true-and-false-positive
  * rows instead of the full fact table. Spark's AQE injects the same
  * pattern automatically only when shuffle-stage statistics qualify; this
  * operator makes it explicit, plannable, and usable on first runs.
  *
  * No false negatives (Bloom guarantee) + the exact semi join afterwards
  * ⇒ the result is IDENTICAL to a plain semi join (pinned by
  * BloomJoinSpec and the `q_bloom_join` DuckDB oracle). */
object BloomJoin {

  private val names = new AtomicLong()

  /** `probe LEFT SEMI JOIN build ON probe(probeKey) = build(buildKey)`,
    * Bloom-prefiltered. Keys are compared as longs (cast internally) —
    * integral key columns only. `expectedItems` sizes the filter; the
    * default 1% fpp costs ~9.6 bits/key. */
  def semiJoin(probe: DataFrame, build: DataFrame,
               probeKey: String, buildKey: String,
               expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val spark = probe.sparkSession
    val bloom = build.select(col(buildKey).cast("long").as("k"))
      .na.drop("any", Seq("k"))
      .stat.bloomFilter("k", expectedItems, fpp)
    val name = s"graft_bloom_contains_${names.incrementAndGet()}"
    // bounded registration: the closure holds the whole Bloom sketch, so
    // unevicted per-call registrations would leak ~1 MB each
    graft.functions.TransientFunctions.register(spark, "graft_bloom", name,
      classOf[BloomMightContainLong],
      (exprs: Seq[Expression]) => BloomMightContainLong(exprs.head, bloom))
    val prefiltered = probe.filter(
      call_function(name, col(probeKey).cast("long")))
    prefiltered.join(build,
      prefiltered(probeKey) === build(buildKey), "left_semi")
  }
}

/** `bloom.mightContainLong(child)` as a deterministic scalar predicate;
  * NULL keys never match (semi-join semantics). The filter rides the
  * closure into each task once (it is broadcast-sized by construction).
  * Real codegen (the sketch becomes a referenced object, the probe a
  * direct method call): this predicate runs on EVERY probe-side row
  * pre-shuffle — exactly where a CodegenFallback row materialization
  * would cost the most. */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_contains"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false else bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    ev.copy(code = c.code + code"""
      final boolean ${ev.value} = !${c.isNull} &&
        $ref.mightContainLong(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}
