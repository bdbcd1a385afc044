package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Heavy-hitter state for `approx_top_k` in materialized views: ONE
  * struct column pairing a count-min sketch with its candidate set —
  * the CMS answers "how often", the candidates answer "which items"
  * (a CMS alone cannot enumerate), exactly the pair the library-level
  * frequency rollup in [[graft.ops.Sketches]] keeps in two columns.
  * Candidates are capped at [[TopkKernels.CandidateFactor]]·k and
  * pruned by sketch-estimated rank, so state per group is O(k) forever;
  * counters cannot retract, so MV maintenance under deletes goes
  * through the per-touched-group recompute path, never a silent
  * under-count. Items ride as STRINGS (the MV funnel casts), keeping
  * the hash family uniform between build and readout. */
object TopkKernels {

  /** Candidate headroom over the requested k — items that were top-k in
    * ANY absorbed slice survive merges until the union prunes. */
  val CandidateFactor = 4

  private[functions] def utf8Bytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Keep the estimate-ranked (desc, then item asc) first `cap`. */
  private[functions] def prune(cms: CountMinSketch,
                               cands: java.util.HashSet[String],
                               cap: Int): Array[String] = {
    val arr = cands.toArray(new Array[String](cands.size()))
    val ranked = arr.map(s => (s, cms.estimateCount(utf8Bytes(s))))
      .sortBy { case (s, c) => (-c, s) }
    ranked.take(cap).map(_._1)
  }

  private[functions] def sketchBytes(cms: CountMinSketch): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    cms.writeTo(out)
    out.toByteArray
  }

  private[functions] def toStruct(cms: CountMinSketch,
                                  cands: Array[String]): InternalRow =
    new GenericInternalRow(Array[Any](sketchBytes(cms),
      new GenericArrayData(cands.map(s =>
        UTF8String.fromString(s).asInstanceOf[Any]))))

  /** Combine two stored states: counter-wise sketch sum (the CMS
    * monoid), candidate union, estimate-ranked prune back to
    * `CandidateFactor`·k — the scalar the MV merge's update expression
    * calls, mirroring the library refresh's merge + pruneCandidates. */
  def combine(a: InternalRow, b: InternalRow, topM: Int): InternalRow = {
    val cms = CountMinSketch.readFrom(a.getBinary(0))
    cms.mergeInPlace(CountMinSketch.readFrom(b.getBinary(0)))
    val cands = new java.util.HashSet[String]()
    Seq(a, b).foreach { r =>
      val arr = r.getArray(1)
      var i = 0
      while (i < arr.numElements()) {
        cands.add(arr.getUTF8String(i).toString); i += 1
      }
    }
    toStruct(cms, prune(cms, cands, CandidateFactor * topM))
  }
}

/** Mutable buffer of [[TopkAgg]]. */
final class TopkBuffer(var cms: CountMinSketch,
                       val cands: java.util.HashSet[String])

/** `graft_topk_agg(itemString, k, eps, confidence, seed)` — per-group
  * heavy-hitter state as `struct<sketch: binary, cands: array<string>>`.
  * Partials merge (sketch sum + candidate union + prune), so map-side
  * combine works; the emitted candidate list is estimate-ranked
  * (desc, item asc) and capped at 4k. */
case class TopkAgg(
    child: Expression, topM: Int, eps: Double, confidence: Double,
    seed: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopkBuffer] {

  require(topM > 0, s"graft_topk_agg: k=$topM")
  private val cap = TopkKernels.CandidateFactor * topM

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("graft_topk_agg(string, ...)")
  override def dataType: DataType = StructType(Seq(
    StructField("sketch", BinaryType, nullable = false),
    StructField("cands", ArrayType(StringType, containsNull = false),
      nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_agg"

  override def createAggregationBuffer(): TopkBuffer =
    new TopkBuffer(CountMinSketch.create(eps, confidence, seed),
      new java.util.HashSet[String]())

  override def update(buf: TopkBuffer, input: InternalRow): TopkBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.cms.addBinary(TopkKernels.utf8Bytes(s))
      buf.cands.add(s)
      // amortized bound: admit freely to 2·cap, then prune to cap by
      // current estimate (a seen-so-far over-count, never an under)
      if (buf.cands.size() > 2 * cap) repack(buf)
    }
    buf
  }

  private def repack(buf: TopkBuffer): Unit = {
    val kept = TopkKernels.prune(buf.cms, buf.cands, cap)
    buf.cands.clear()
    kept.foreach(buf.cands.add)
  }

  override def merge(buf: TopkBuffer, other: TopkBuffer): TopkBuffer = {
    buf.cms.mergeInPlace(other.cms)
    buf.cands.addAll(other.cands)
    if (buf.cands.size() > 2 * cap) repack(buf)
    buf
  }

  override def eval(buf: TopkBuffer): Any =
    TopkKernels.toStruct(buf.cms,
      TopkKernels.prune(buf.cms, buf.cands, cap))

  override def serialize(buf: TopkBuffer): Array[Byte] = {
    val sk = TopkKernels.sketchBytes(buf.cms)
    val items = buf.cands.toArray(new Array[String](buf.cands.size()))
      .map(TopkKernels.utf8Bytes)
    val bb = java.nio.ByteBuffer.allocate(
      8 + sk.length + items.map(_.length + 4).sum)
    bb.putInt(sk.length).put(sk).putInt(items.length)
    items.foreach(b => { bb.putInt(b.length); bb.put(b); () })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopkBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val sk = new Array[Byte](bb.getInt); bb.get(sk)
    val n = bb.getInt
    val cands = new java.util.HashSet[String]()
    (0 until n).foreach { _ =>
      val b = new Array[Byte](bb.getInt); bb.get(b)
      cands.add(new String(b, java.nio.charset.StandardCharsets.UTF_8)); ()
    }
    new TopkBuffer(CountMinSketch.readFrom(sk), cands)
  }

  override def withNewMutableAggBufferOffset(o: Int): TopkAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopkAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopkAgg =
    copy(child = newChildren(0))
}

/** `graft_topk_combine(a, b, k)` — merge two stored top-k states
  * (struct × struct × int → struct), the MV merge's combine. */
case class TopkCombine(first: Expression, second: Expression,
                       third: Expression) extends TernaryExpression {

  override def dataType: DataType = first.dataType
  override def prettyName: String = "graft_topk_combine"

  override protected def nullSafeEval(a: Any, b: Any, k: Any): Any =
    TopkKernels.combine(a.asInstanceOf[InternalRow],
      b.asInstanceOf[InternalRow], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, k) =>
      s"graft.functions.TopkKernels.combine($a, $b, $k)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): TopkCombine =
    copy(first = f, second = s, third = t)
}

/** Session registration, idempotent and quiet — the sibling of
  * [[QuantFunctions.register]] for the top-k family. */
object TopkFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (registry.functionExists(FunctionIdentifier("graft_topk_agg")))
      return
    registry.registerFunction(
      FunctionIdentifier("graft_topk_agg"),
      new ExpressionInfo(classOf[TopkAgg].getName, "graft_topk_agg"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(v, Literal(k, IntegerType), Literal(eps: Double, DoubleType),
                 Literal(conf: Double, DoubleType),
                 Literal(seed, IntegerType)) =>
          TopkAgg(v, k.asInstanceOf[Int], eps, conf, seed.asInstanceOf[Int])
        case _ => throw new IllegalArgumentException(
          "usage: graft_topk_agg(item, kInt, epsD, confD, seedInt) with " +
            "literal parameters")
      })
    registry.registerFunction(
      FunctionIdentifier("graft_topk_combine"),
      new ExpressionInfo(classOf[TopkCombine].getName, "graft_topk_combine"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(a, b, k) => TopkCombine(a, b, k)
        case _ => throw new IllegalArgumentException(
          "usage: graft_topk_combine(struct, struct, kInt)")
      })
  }
}
