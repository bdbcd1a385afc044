package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** The scalar loop bodies of the custom expressions, as a top-level object
  * so whole-stage codegen can call them through the class's static
  * forwarders (`graft.functions.HashKernels.simhash(...)` from generated
  * Java). One definition serves both execution modes: interpreted `eval`
  * delegates here, and `doGenCode` emits a single static call — the
  * expressions stay INSIDE whole-stage codegen instead of forcing the
  * CodegenFallback row materialization on every row of the hot dedup
  * paths. */
object HashKernels {

  /** array<string> shingles → k-permutation MinHash signature. */
  def minhashFromStrings(arr: ArrayData, numHashes: Int): ArrayData = {
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

  /** array<string> tokens → distinct n-token shingle strings,
    * first-occurrence order; shorter-than-n docs → the whole text. */
  def wordShingles(arr: ArrayData, n: Int): ArrayData = {
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

  /** array<string> tokens → distinct hashes of n-token shingles (each
    * token hashed once, shingle hash = chained hashLong combine). */
  def shingleHashes(arr: ArrayData, n: Int): ArrayData = {
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

  /** array<long> shingle hashes → k-permutation MinHash signature. */
  def minhashFromHashes(arr: ArrayData, numHashes: Int): ArrayData = {
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

  /** array<string> tokens → 64-bit SimHash (±1 vote per bit). */
  def simhash(arr: ArrayData): Long = {
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

  /** array<double> × hyperplanes → sign-bit bucket; NULL elements or a
    * dimension mismatch follow the HOF reference (bit 0 / bucket 0). */
  def lshBucket(vec: ArrayData, planes: Array[Array[Double]]): Long = {
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

  /** Pairwise cosine similarity of two array<double> columns — one fused
    * loop per row where the higher-order formulation
    * (`when(l2Norm(a)*l2Norm(b) > 0, dot/(na*nb)).otherwise(0)`) pays
    * ~3·dim interpreted lambda dispatches per row (measured ~1ms/row at
    * dim 64, the dominant cost of every brute-force re-rank). Semantics
    * mirror the HOF EXACTLY, accumulator order included (each of
    * d/Σa²/Σb² sums left-to-right, so IEEE results are bit-identical):
    *  - null array or null element → 0.0 (the HOF's norm goes NULL,
    *    the `when` condition is NULL, the otherwise(0.0) fires);
    *  - dimension mismatch with a passing norm condition → SQL NULL
    *    (the HOF's zip_with pads with NULL, so dot is NULL while the
    *    condition is TRUE);
    *  - zero norm → 0.0; a NaN norm yields NaN (Spark orders NaN as
    *    LARGEST, so the HOF's `n > 0` is TRUE for NaN and the division
    *    itself surfaces). */
  def cosinePair(a: ArrayData, b: ArrayData): java.lang.Double = {
    if (a == null || b == null) return java.lang.Double.valueOf(0.0d)
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return java.lang.Double.valueOf(0.0d); i += 1
    }
    i = 0
    while (i < m) {
      if (b.isNullAt(i)) return java.lang.Double.valueOf(0.0d); i += 1
    }
    // Spark's comparison semantics order NaN as the LARGEST double, so
    // the HOF's `n > 0` gate PASSES for a NaN norm product
    @inline def gate(v: Double): Boolean =
      java.lang.Double.isNaN(v) || v > 0
    if (n != m) {
      // norms are per-side, so the HOF's condition can still pass —
      // in which case its NULL dot surfaces as a NULL similarity
      var sa = 0.0d; var sb = 0.0d
      i = 0; while (i < n) { val x = a.getDouble(i); sa += x * x; i += 1 }
      i = 0; while (i < m) { val y = b.getDouble(i); sb += y * y; i += 1 }
      return if (gate(math.sqrt(sa) * math.sqrt(sb))) null
             else java.lang.Double.valueOf(0.0d)
    }
    var d = 0.0d; var sa = 0.0d; var sb = 0.0d
    i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      d += x * y; sa += x * x; sb += y * y
      i += 1
    }
    val nn = math.sqrt(sa) * math.sqrt(sb)
    java.lang.Double.valueOf(if (gate(nn)) d / nn else 0.0d)
  }

  /** array<double> × centroids → nearest-centroid index (squared L2,
    * lowest-index tiebreak); degenerate inputs → cell 0. */
  def nearestCell(vec: ArrayData, centroids: Array[Array[Double]]): Int = {
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

  /** Chain candidate anchors into EXACT duplicated spans — the verify
    * stage of Dedup.duplicateSpans, one loop per (docA, docB,
    * alignment) row. Input struct: (textA, textB, d, anchorPositions)
    * where d = posA − posB is the fixed alignment and positions are
    * candidate posA values (unsorted, possibly duplicated, possibly
    * 32-bit-collision garbage). Each anchor's k-gram is compared
    * codepoint-for-codepoint (collisions die here); consecutive good
    * anchors within `w` grams extend a chain iff the whole gap content
    * matches exactly; chains shorter than `minLen` drop. Output packs
    * `(startA << 32) | spanLen` per surviving chain. */
  def chainSpans(row: org.apache.spark.sql.catalyst.InternalRow,
                 k: Int, w: Int, minLen: Int): ArrayData = {
    // a struct child bypasses UnaryExpression's null-safety for its
    // FIELDS (the struct itself is non-null) — ad-hoc SQL callers can
    // hand us null texts/positions; no spans is the only sane answer
    if (row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2) ||
        row.isNullAt(3))
      return new GenericArrayData(Array.empty[Long])
    val a = row.getUTF8String(0).toString.codePoints.toArray
    val b = row.getUTF8String(1).toString.codePoints.toArray
    val d = row.getInt(2)
    val posArr = row.getArray(3)
    val ps0 = new scala.collection.mutable.ArrayBuffer[Int](posArr.numElements())
    var j0 = 0
    while (j0 < posArr.numElements()) {
      if (!posArr.isNullAt(j0)) ps0 += posArr.getInt(j0)
      j0 += 1
    }
    val ps = ps0.toArray
    val m = ps.length
    java.util.Arrays.sort(ps)
    // codepoint equality of a[pa, pa+len) vs b[pa-d, pa-d+len)
    def eqAt(pa: Int, len: Int): Boolean = {
      val pb = pa - d
      if (pa < 0 || pb < 0 || pa + len > a.length || pb + len > b.length)
        return false
      var j = 0
      while (j < len) {
        if (a(pa + j) != b(pb + j)) return false
        j += 1
      }
      true
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    var start = -1
    var prev = -1
    def close(): Unit = {
      if (start >= 0 && prev - start + k >= minLen)
        out += (start.toLong << 32) | (prev - start + k).toLong
      start = -1; prev = -1
    }
    var i = 0
    while (i < m) {
      val p = ps(i)
      if (p != prev) { // dedup repeated candidate positions
        if (start >= 0 && p - prev <= w && eqAt(prev, p - prev + k))
          prev = p // gap verified: [prev, p+k) equal on both sides
        else {
          close()
          if (eqAt(p, k)) { start = p; prev = p }
        }
      }
      i += 1
    }
    close()
    new GenericArrayData(out.toArray)
  }

  /** Excise codepoint ranges from `text`: `cuts` is an array of
    * (start, len) structs in CODEPOINT coordinates (matching
    * [[winnow]]'s positions and SQL substring semantics). Ranges are
    * clamped to the text, sorted and merged (overlapping spans from
    * multiple pairs cut once), and the survivors concatenate in order.
    * One loop per row; used by Dedup.cutSpans. */
  def excise(text: UTF8String, cuts: ArrayData): UTF8String = {
    val m = cuts.numElements()
    if (m == 0) return text
    val cps = text.toString.codePoints.toArray
    val n = cps.length
    val iv = new Array[(Int, Int)](m)
    var i = 0
    while (i < m) {
      val row = cuts.getStruct(i, 2)
      val s0 = math.max(0, row.getInt(0))
      val e0 = math.min(n, row.getInt(0) + math.max(0, row.getInt(1)))
      iv(i) = (math.min(s0, n), math.max(e0, math.min(s0, n)))
      i += 1
    }
    val sorted = iv.sortBy(_._1)
    val sb = new java.lang.StringBuilder(n)
    var cursor = 0
    i = 0
    while (i < m) {
      val (s0, e0) = sorted(i)
      if (s0 > cursor) {
        var j = cursor
        while (j < s0) { sb.appendCodePoint(cps(j)); j += 1 }
      }
      cursor = math.max(cursor, e0)
      i += 1
    }
    var j = cursor
    while (j < n) { sb.appendCodePoint(cps(j)); j += 1 }
    UTF8String.fromString(sb.toString)
  }

  /** Winnowed fingerprints (Schleimer et al. 2003 — the MOSS local
    * fingerprinting scheme): Karp-Rabin rolling hashes of every
    * k-codepoint gram, one selection (rightmost minimum) per sliding
    * window of `w` grams, consecutive re-selections deduped. Any two
    * texts sharing a substring of ≥ w + k - 1 codepoints share at least
    * one selected fingerprint — the selection inside a full window is a
    * pure function of that window's hashes, so identical content makes
    * identical (relative) selections. Output packs
    * `(hash32 << 32) | codepointPos` into one long per fingerprint
    * (positions are CODEPOINT indices, aligning with SQL `substring`
    * semantics so callers can verify candidates exactly). Texts shorter
    * than w + k - 1 grams clamp the window (≥ one fingerprint for any
    * text of ≥ k codepoints) — they cannot contain a qualifying span,
    * but still participate as candidate sources. 32-bit hash collisions
    * only create false CANDIDATES; callers verify by substring. */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val cps = text.toString.codePoints.toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val B = 1000003L
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk *= B; i += 1 }
    // rolling 64-bit polynomial per gram, finalizer-mixed to 32 bits
    val h32 = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + cps(i); i += 1 }
    h32(0) = ((h * 0x9E3779B97F4A7C15L) >>> 32) & 0xFFFFFFFFL
    i = 1
    while (i < m) {
      h = (h - cps(i - 1) * bk) * B + cps(i + k - 1)
      h32(i) = ((h * 0x9E3779B97F4A7C15L) >>> 32) & 0xFFFFFFFFL
      i += 1
    }
    val win = math.min(w, m)
    val out = new scala.collection.mutable.ArrayBuffer[Long](m / math.max(win / 2, 1) + 1)
    val dq = new java.util.ArrayDeque[Int]()
    var last = -1
    i = 0
    while (i < m) {
      while (!dq.isEmpty && h32(dq.peekLast()) >= h32(i)) dq.removeLast()
      dq.addLast(i)
      if (dq.peekFirst() <= i - win) dq.removeFirst()
      if (i >= win - 1) {
        val sel = dq.peekFirst()
        if (sel != last) { out += (h32(sel) << 32) | sel.toLong; last = sel }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
