package graft.functions

import java.util.{HashMap => JHashMap}

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
  extends TypedImperativeAggregate[JHashMap[Long, Long]] {

  require(scale > 0 && sub > 0, s"graft_quant_hist: scale=$scale sub=$sub")

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

  override def createAggregationBuffer(): JHashMap[Long, Long] =
    new JHashMap[Long, Long]()

  override def update(buf: JHashMap[Long, Long],
                      input: InternalRow): JHashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = sgn.eval(input)
      if (s != null && s.asInstanceOf[Long] != 0L)
        bump(buf, QuantKernels.bucketKey(v.asInstanceOf[Double], scale, sub),
          s.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: JHashMap[Long, Long],
                     other: JHashMap[Long, Long]): JHashMap[Long, Long] = {
    other.forEach((k, c) => bump(buf, k, c))
    buf
  }

  private def bump(buf: JHashMap[Long, Long], k: Long, c: Long): Unit = {
    val n = buf.getOrDefault(k, 0L) + c
    if (n == 0L) { buf.remove(k); () } else { buf.put(k, n); () }
  }

  override def eval(buf: JHashMap[Long, Long]): Any = {
    val keys = new Array[Long](buf.size())
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys)
    new ArrayBasedMapData(
      new GenericArrayData(keys),
      new GenericArrayData(keys.map(buf.get(_))))
  }

  override def serialize(buf: JHashMap[Long, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    buf.forEach((k, c) => { bb.putLong(k); bb.putLong(c); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JHashMap[Long, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new JHashMap[Long, Long](math.max(8, n * 2))
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
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
