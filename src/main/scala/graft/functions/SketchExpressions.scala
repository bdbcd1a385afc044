package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch companions to Spark's built-in `count_min_sketch`
  * aggregate: Spark can BUILD the sketch (a BINARY column) but ships no
  * SQL surface to MERGE two sketches or to POINT-QUERY one — exactly
  * the two operations an incrementally-maintained frequency rollup
  * needs. These expressions close that gap against the same public
  * `org.apache.spark.util.sketch.CountMinSketch` codec the aggregate
  * serializes with, so a sketch built by the builtin, merged here, is
  * indistinguishable from one built over the union of the slices
  * (counter-wise addition — the CMS monoid).
  *
  * Both are scalar, map-only, partition-parallel. `doGenCode` is a
  * single static kernel call, keeping rollup projections inside
  * whole-stage codegen (the HashExpressions discipline). */
object SketchKernels {

  /** Counter-wise sum of two serialized sketches. Shapes must agree
    * (same depth/width/seed) — a mismatch throws Spark's own
    * IncompatibleMergeException, loudly. */
  def cmsMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val s = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(a))
    s.mergeInPlace(
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b)))
    val out = new java.io.ByteArrayOutputStream()
    s.writeTo(out)
    out.toByteArray
  }

  /** Estimated occurrence count of a STRING item. Matches the builtin
    * aggregate's update path for StringType columns (both hash the
    * UTF-8 bytes), so estimates line up with what was added. */
  def cmsEstimateString(sketch: Array[Byte], item: UTF8String): Long =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketch))
      .estimateCount(item.getBytes)

  /** Estimated occurrence count of an integral item (the aggregate
    * adds byte/short/int/long columns through the long path). */
  def cmsEstimateLong(sketch: Array[Byte], item: Long): Long =
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketch))
      .estimateCount(java.lang.Long.valueOf(item))
}

/** `graft_cms_merge(a, b)` — counter-wise sum of two count-min
  * sketches; BINARY × BINARY → BINARY. */
case class CmsMerge(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cms_merge"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.cmsMerge(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SketchKernels.cmsMerge($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsMerge =
    copy(left = newLeft, right = newRight)
}

/** `graft_cms_estimate(sketch, item)` — the sketch's estimated count
  * for `item` (an over-approximation by construction: never less than
  * the true count). Item type drives the hash family: strings hash
  * their UTF-8 bytes (the aggregate's StringType path), integrals the
  * long path — mixing families would silently estimate zero. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  private val stringItem: Boolean = right.dataType == StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType == BinaryType &&
      (right.dataType == StringType ||
        Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(right.dataType))
    if (ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("graft_cms_estimate(binary, string|integral)")
  }

  override protected def nullSafeEval(sketch: Any, item: Any): Any =
    if (stringItem)
      SketchKernels.cmsEstimateString(sketch.asInstanceOf[Array[Byte]],
        item.asInstanceOf[UTF8String])
    else SketchKernels.cmsEstimateLong(sketch.asInstanceOf[Array[Byte]],
      item.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (stringItem)
      defineCodeGen(ctx, ev, (s, i) =>
        s"graft.functions.SketchKernels.cmsEstimateString($s, $i)")
    else
      defineCodeGen(ctx, ev, (s, i) =>
        s"graft.functions.SketchKernels.cmsEstimateLong($s, (long)$i)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

/** Session registration, idempotent — the sibling of
  * [[GraftFunctions.register]] for the sketch family. */
object SketchFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    // quiet idempotence: rollup refresh and MV read paths register per
    // call, and a re-registration logs a replace warning every time
    if (registry.functionExists(FunctionIdentifier("graft_cms_merge")))
      return

    registry.registerFunction(
      FunctionIdentifier("graft_cms_merge"),
      new ExpressionInfo(classOf[CmsMerge].getName, "graft_cms_merge"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b) => CmsMerge(a, b)
        case _ => throw new IllegalArgumentException(
          "usage: graft_cms_merge(binary, binary)")
      })

    registry.registerFunction(
      FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "graft_cms_estimate"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(s, i) => CmsEstimate(s, i)
        case _ => throw new IllegalArgumentException(
          "usage: graft_cms_estimate(binary, item)")
      })
  }
}
