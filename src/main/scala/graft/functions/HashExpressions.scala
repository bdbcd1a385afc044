package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the signature-heavy dedup operators.
  *
  * Spark's higher-order array functions (transform/aggregate/zip_with) are
  * interpreted per element — a 128-hash MinHash over ~50 shingles costs
  * ~6.4k lambda dispatches per row. These expressions do the same math in
  * one tight JVM loop per row (measured ~20× on the documents corpus).
  * They are pure scalar expressions: map-only, partition-parallel, no
  * state — safe at any scale.
  */

/** array<string> shingles → array<long> k-permutation MinHash signature.
  *
  * Bit-for-bit identical to the built-in higher-order formulation
  * `transform(sequence(0, k-1), i -> array_min(transform(hashes, h ->
  * xxhash64(h, i))))` over `hashes = transform(shingles, xxhash64)`:
  * h0 = xxhash64(shingle) = hashUnsafeBytes(s, 42); then Spark's binary
  * xxhash64(h0, i) chains hashLong(h0, 42) → hashInt(i, ·). Keeping the
  * families equal makes the expression a drop-in swap verified by
  * HashExpressionsSpec. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h0 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        val h1 = XXH64.hashLong(h0, 42L)
        var k = 0
        while (k < numHashes) {
          val h = XXH64.hashInt(k, h1)
          if (h < sig(k)) sig(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** array<string> tokens → array<string> distinct n-token shingle strings,
  * first-occurrence order — same output as the higher-order formulation
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * slice(toks, i+1, n))))` (Dedup.wordShingles), evaluated in one loop
  * (no per-lambda interpretation). Shorter-than-n docs yield the whole
  * text as one shingle. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val toks = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    val count = if (m <= n) 1 else m - n + 1
    val width = math.min(n, m)
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    i = 0
    while (i < count) {
      val parts = new Array[UTF8String](width)
      var j = 0
      while (j < width) { parts(j) = toks(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** array<string> tokens → array<long> distinct hashes of n-token shingles.
  *
  * Replaces "build shingle strings, then hash them": each token is hashed
  * once (xxhash64, seed 42) and the shingle hash is the chained
  * hashLong-combine of its n token hashes — no string concatenation, no
  * intermediate arrays, one pass. Order-sensitive like the string form.
  * Shorter-than-n docs yield one whole-doc shingle hash (mirrors
  * Dedup.wordShingles' fallback). */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val tokHashes = new Array[Long](m)
    var i = 0
    while (i < m) {
      tokHashes(i) =
        if (arr.isNullAt(i)) 0L
        else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      i += 1
    }
    val count = if (m <= n) 1 else m - n + 1
    val width = math.min(n, m)
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Long](count)
    i = 0
    while (i < count) {
      var h = 42L
      var j = 0
      while (j < width) { h = XXH64.hashLong(tokHashes(i + j), h); j += 1 }
      if (seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** array<long> shingle hashes → array<long> k-permutation MinHash
  * signature. Same permutation family as [[MinHashSignature]] but skips
  * the string hash (inputs are already hashed): per element,
  * h1 = hashLong(x, 42), then permutation k = hashInt(k, h1). */
case class MinHashFromHashes(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h1 = XXH64.hashLong(arr.getLong(i), 42L)
        var k = 0
        while (k < numHashes) {
          val h = XXH64.hashInt(k, h1)
          if (h < sig(k)) sig(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashes =
    copy(child = newChild)
}

/** array<string> tokens → 64-bit SimHash. Bit-for-bit identical to the
  * higher-order-function formulation (per-token xxhash64 seed 42, ±1 vote
  * per bit, sign → bit), just evaluated in one loop. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        var j = 0
        while (j < 64) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** array<double> vector × literal hyperplanes → sign-bit LSH bucket id.
  * Same math as the higher-order formulation (per-plane zip_with dot,
  * accumulated left-to-right in doubles, bit set when dot >= 0 — see
  * Similarity.lshBucketHof) in one loop per row: numPlanes interpreted
  * HOF dots collapse into a single scalar pass over the vector. */
case class LshBucketId(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_lsh_bucket"

  /** Degenerate inputs follow the HOF reference exactly: a NULL vector, a
    * NULL element, or a dimension mismatch NULLs every per-plane dot there
    * (zip_with pads with NULL, NULL * x = NULL), and `when(null >= 0)`
    * takes the otherwise(0) branch — so the bucket is 0L, never NULL. */
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val vec = v.asInstanceOf[ArrayData]
    val n = vec.numElements()
    var i = 0
    while (i < n) { if (vec.isNullAt(i)) return 0L; i += 1 }
    var bucket = 0L
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      if (pl.length == n) { // mismatch → dot is NULL in the HOF → bit 0
        var d = 0.0d
        i = 0
        while (i < n) { d += vec.getDouble(i) * pl(i); i += 1 }
        if (d >= 0) bucket |= (1L << p)
      }
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketId =
    copy(child = newChild)
}

/** array<double> vector × literal centroids → index (int) of the nearest
  * centroid by squared L2; ties keep the lowest index. One tight loop per
  * row, replacing the transform+array_position HOF pair (interpreted per
  * element — nCells × dim lambda dispatches per row). Degenerate inputs
  * (NULL vector, NULL element, dimension mismatch vs every centroid)
  * assign cell 0, mirroring the HOF formulation where a NULL distance
  * never wins `array_min`. */
case class NearestCell(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_nearest_cell"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0
    val vec = v.asInstanceOf[ArrayData]
    val n = vec.numElements()
    var i = 0
    while (i < n) { if (vec.isNullAt(i)) return 0; i += 1 }
    val arr = new Array[Double](n)
    i = 0
    while (i < n) { arr(i) = vec.getDouble(i); i += 1 }
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      if (cent.length == n) {
        var d = 0.0d
        var j = 0
        while (j < n && d < bestD) {
          val diff = arr(j) - cent(j); d += diff * diff; j += 1
        }
        if (j == n && d < bestD) { bestD = d; best = c }
      }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

/** Session registration for the custom expressions, so plans can call them
  * via `call_function("graft_minhash", shingles, lit(k))`. Idempotent. */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry

    registry.registerFunction(
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(child, Literal(k: Int, IntegerType)) => MinHashSignature(child, k)
        case _ => throw new IllegalArgumentException(
          "usage: graft_minhash(array<string>, <int literal>)")
      })

    registry.registerFunction(
      FunctionIdentifier("graft_word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "graft_word_shingles"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(child, Literal(n: Int, IntegerType)) => WordShingles(child, n)
        case _ => throw new IllegalArgumentException(
          "usage: graft_word_shingles(array<string>, <int literal>)")
      })

    registry.registerFunction(
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(child, Literal(n: Int, IntegerType)) => ShingleHashes(child, n)
        case _ => throw new IllegalArgumentException(
          "usage: graft_shingle_hashes(array<string>, <int literal>)")
      })

    registry.registerFunction(
      FunctionIdentifier("graft_minhash_hashes"),
      new ExpressionInfo(classOf[MinHashFromHashes].getName, "graft_minhash_hashes"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(child, Literal(k: Int, IntegerType)) => MinHashFromHashes(child, k)
        case _ => throw new IllegalArgumentException(
          "usage: graft_minhash_hashes(array<long>, <int literal>)")
      })

    registry.registerFunction(
      FunctionIdentifier("graft_lsh_bucket"),
      new ExpressionInfo(classOf[LshBucketId].getName, "graft_lsh_bucket"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(vec, pl @ Literal(_, ArrayType(ArrayType(DoubleType, _), _))) =>
          val planes = pl.value.asInstanceOf[ArrayData]
            .toObjectArray(ArrayType(DoubleType))
            .map(_.asInstanceOf[ArrayData].toDoubleArray())
          LshBucketId(vec, planes)
        case _ => throw new IllegalArgumentException(
          "usage: graft_lsh_bucket(array<double>, <array<array<double>> literal>)")
      })

    registry.registerFunction(
      FunctionIdentifier("graft_nearest_cell"),
      new ExpressionInfo(classOf[NearestCell].getName, "graft_nearest_cell"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(vec, cl @ Literal(_, ArrayType(ArrayType(DoubleType, _), _))) =>
          val cents = cl.value.asInstanceOf[ArrayData]
            .toObjectArray(ArrayType(DoubleType))
            .map(_.asInstanceOf[ArrayData].toDoubleArray())
          NearestCell(vec, cents)
        case _ => throw new IllegalArgumentException(
          "usage: graft_nearest_cell(array<double>, <array<array<double>> literal>)")
      })

    registry.registerFunction(
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(child) => SimHash64(child)
        case _ => throw new IllegalArgumentException(
          "usage: graft_simhash(array<string>)")
      })
  }
}
