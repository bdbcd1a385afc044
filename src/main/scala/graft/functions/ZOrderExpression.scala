package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) key for multi-column clustering.
  *
  * Each child value is mapped to an equi-depth bucket 0..2^bitsPerCol-1 by
  * binary search over its column's quantile `boundaries` (computed once,
  * driver-side, via approxQuantile — equi-depth so skewed columns still
  * spread over all buckets), then the bucket bits of all columns are
  * interleaved into one long. Sorting by that key clusters rows so that a
  * range predicate on ANY of the z-ordered columns touches only
  * ~n^((d-1)/d) of the file-sets — the standard multi-dimensional data-
  * skipping layout (Delta's OPTIMIZE ZORDER BY).
  *
  * Real codegen like the other graft expressions: per child, a static
  * bucket+interleave call against a referenced boundary array; NULLs sort
  * to bucket 0, matching NULLS FIRST.
  */
case class ZOrderKey(children: Seq[Expression],
                     boundaries: Array[Array[Double]], bitsPerCol: Int)
  extends Expression {

  require(children.size == boundaries.length,
    "one boundary array per z-ordered column")
  require(children.size * bitsPerCol <= 62,
    s"${children.size} cols x $bitsPerCol bits exceeds a long")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_zorder_key"

  override def eval(input: InternalRow): Any = {
    val d = children.size
    var key = 0L
    var c = 0
    while (c < d) {
      val raw = children(c).eval(input)
      val bucket =
        if (raw == null) 0
        else ZOrderKey.bucketIndex(
          raw.asInstanceOf[Number].doubleValue(), boundaries(c))
      key |= ZOrderKey.interleave(bucket, bitsPerCol, d, c)
      c += 1
    }
    key
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val d = children.size
    val gens = children.map(_.genCode(ctx))
    val perChild = gens.zipWithIndex.map { case (g, c) =>
      val ref = ctx.addReferenceObj(s"zb$c", boundaries(c), "double[]")
      code"""
        ${g.code}
        if (!${g.isNull}) {
          ${ev.value} |= graft.functions.ZOrderKey.interleave(
            graft.functions.ZOrderKey.bucketIndex((double)(${g.value}), $ref),
            $bitsPerCol, $d, $c);
        }"""
    }.reduce(_ + _)
    ev.copy(code = code"""
      long ${ev.value} = 0L;""" + perChild,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrderKey =
    copy(children = newChildren)
}

object ZOrderKey {

  /** Count of cuts <= v via binary search == equi-depth bucket index. */
  def bucketIndex(v: Double, cuts: Array[Double]): Int = {
    var lo = 0; var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Interleave: bit b of column c lands at position b*d + c. */
  def interleave(bucket: Int, bitsPerCol: Int, d: Int, c: Int): Long = {
    var key = 0L
    var b = 0
    while (b < bitsPerCol) {
      if (((bucket >> b) & 1) == 1) key |= 1L << (b * d + c)
      b += 1
    }
    key
  }
}
