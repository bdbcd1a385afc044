package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** The log2-octave histogram bucket function — the JVM twin of
  * [[graft.ops.Sketches]]' relational `withBucketKey`, kept
  * bit-identical so a histogram built by this aggregate merges with
  * (and equals) one built by the two-level relational aggregation:
  *
  *   w   = max(1, floor(|v| * scale + 0.5))   exact scaled magnitude
  *   e   = floor(log2 w)                      exact, via leading zeros
  *   key = sign(v) * (1 + e*sub + ((w - 2^e) * sub) div 2^e)
  *
  * zero → key 0; NaN → key 0 (matching `signum(NaN) cast long = 0` on
  * the SQL side); both engines run the same IEEE double ops and the
  * same Java long arithmetic, so every input lands in the same bucket
  * either way. */
object QuantKernels {

  def bucketKey(v: Double, scale: Long, sub: Int): Long =
    if (v == 0.0d || java.lang.Double.isNaN(v)) 0L
    else {
      val w0 = math.floor(math.abs(v) * scale.toDouble + 0.5d)
      // Double→Long cast saturates at Long.MaxValue in both engines
      val w = if (w0 < 1.0d) 1L else w0.toLong
      val e = 63 - java.lang.Long.numberOfLeadingZeros(w)
      val q = 1L << e
      val k = 1L + e.toLong * sub + (w - q) * sub / q
      if (v < 0.0d) -k else k
    }
}

/** `graft_quant_hist(value, sgn)` — per-group log2-octave histogram as
  * `map<bigint,bigint>`: bucket key → SIGNED occurrence count. The one
  * aggregation shape the incremental-MV paths need in a single
  * `groupBy` (the relational form in [[graft.ops.Sketches]] takes two):
  * partials are maps merged entry-wise (map-side combine works), `sgn`
  * carries change-feed signs (+postimage/insert, −preimage/delete), and
  * the finished map is emitted with keys ASCENDING and zero-net buckets
  * dropped — byte-identical storage regardless of partitioning or
  * merge order. Bounded: ≤ 64·sub buckets per sign live at once
  * (~2k entries, KB-scale), so buffers never grow with data. */
case class QuantHistAgg(
    child: Expression, sgn: Expression, scale: Long, sub: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(scale > 0 && sub > 0, s"graft_quant_hist: scale=$scale sub=$sub")
  // Keys are BOUNDED: |key| = 1 + e*sub + frac ≤ 64*sub (e ≤ 63,
  // frac < sub), so the buffer is a dense signed-count array indexed by
  // key + 64*sub — O(1) unboxed bumps and a vector-add merge where the
  // previous JHashMap[Long, Long] paid per-row boxing + hashing (the
  // CDF quant-delta aggregation spent ~3s CPU over 514k rows at sf0.1,
  // ProfQ r17; the dense buffer roughly halves it). 2*64*sub+1 slots =
  // 16KB at the engine's sub=16 — KB-scale per group, same bound as
  // before. eval() walks ascending indices, so the emitted map is
  // byte-identical (keys ascending, zero-net buckets dropped).
  private val off = 64 * sub
  require(off <= (1 << 20),
    s"graft_quant_hist: sub=$sub too large for the dense buffer")

  override def children: Seq[Expression] = Seq(child, sgn)
  // no implicit-cast mixin (AbstractDataType is private[sql]); callers
  // cast the value to double themselves and signs are long literals
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType && sgn.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("graft_quant_hist(double, bigint)")
  override def dataType: DataType =
    MapType(LongType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_quant_hist"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](2 * off + 1)

  override def update(buf: Array[Long],
                      input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = sgn.eval(input)
      if (s != null && s.asInstanceOf[Long] != 0L)
        buf((QuantKernels.bucketKey(v.asInstanceOf[Double], scale, sub)
          + off).toInt) += s.asInstanceOf[Long]
    }
    buf
  }

  override def merge(buf: Array[Long],
                     other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0
    var i = 0
    while (i < buf.length) { if (buf(i) != 0L) n += 1; i += 1 }
    val keys = new Array[Long](n)
    val cnts = new Array[Long](n)
    var j = 0
    i = 0
    while (i < buf.length) {
      if (buf(i) != 0L) { keys(j) = i.toLong - off; cnts(j) = buf(i); j += 1 }
      i += 1
    }
    new ArrayBasedMapData(
      new GenericArrayData(keys), new GenericArrayData(cnts))
  }

  // wire format unchanged from the JHashMap era (count, then k/c pairs
  // of the non-zero buckets) — the format only lives inside one query's
  // partial/final exchange, but keeping it stable costs nothing
  override def serialize(buf: Array[Long]): Array[Byte] = {
    var n = 0
    var i = 0
    while (i < buf.length) { if (buf(i) != 0L) n += 1; i += 1 }
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    i = 0
    while (i < buf.length) {
      if (buf(i) != 0L) { bb.putLong(i.toLong - off); bb.putLong(buf(i)) }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf((bb.getLong + off).toInt) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): QuantHistAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): QuantHistAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantHistAgg =
    copy(child = newChildren(0), sgn = newChildren(1))
}

/** Session registration, idempotent — the sibling of
  * [[SketchFunctions.register]] for the quantile-histogram aggregate. */
object QuantFunctions {

  def register(spark: SparkSession): Unit = {
    // quiet idempotence: the MV/sink paths register per call, and a
    // re-registration would log a replace warning every refresh
    if (spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("graft_quant_hist"))) return
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_quant_hist"),
      new ExpressionInfo(classOf[QuantHistAgg].getName, "graft_quant_hist"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(v, s, Literal(scale: Long, LongType),
                 Literal(sub, IntegerType)) =>
          QuantHistAgg(v, s, scale, sub.asInstanceOf[Int])
        case _ => throw new IllegalArgumentException(
          "usage: graft_quant_hist(value, sgn, scaleL, subInt) with " +
            "literal scale/sub")
      })
  }
}
