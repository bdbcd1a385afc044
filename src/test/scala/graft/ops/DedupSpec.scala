package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** 40 base docs of 30 distinct-ish tokens; ids 1000+i are near-dups of
    * doc i (2 tokens dropped) for i % 4 == 0; 2000/2001 are exact dups. */
  private lazy val corpus: DataFrame = {
    val base = (0 until 40).map { i =>
      val toks = (0 until 30).map(j => s"tok${(i * 7 + j * 3) % 97}_$j")
      (i.toLong, toks.mkString(" "))
    }
    val near = base.filter(_._1 % 4 == 0).map { case (id, text) =>
      (1000L + id, text.split(" ").dropRight(2).mkString(" "))
    }
    val exact = Seq((2000L, base(1)._2), (2001L, base(1)._2))
    (base ++ near ++ exact).toDF("doc_id", "text")
  }

  test("duplicateSpans finds planted cross-doc spans with exact content") {
    val rnd = new scala.util.Random(41)
    def uniqueText(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val planted = "The quick brown fox jumps over the lazy dog while " +
      "seventeen synthetic documents watch in carefully deduplicated " +
      "silence, token by token, span by span, byte for byte."
    assert(planted.length >= 150)
    // docs 1/2/3 carry the planted span at different offsets inside
    // otherwise-unique noise; docs 4/5 are pure noise
    val docs = Seq(
      (1L, uniqueText(200) + planted + uniqueText(100)),
      (2L, uniqueText(50) + planted + uniqueText(250)),
      (3L, planted + uniqueText(300)),
      (4L, uniqueText(400)),
      (5L, uniqueText(380))
    ).toDF("doc_id", "text")
    val minLen = 64
    val k = 16
    val w = minLen - k + 1
    val out = Dedup.duplicateSpans(docs, minLen = minLen, k = k)
      .as[(Long, Long, Int, Int, Int)].collect()
    // exactly the three planted pairs, nothing from the noise docs
    assert(out.map(r => (r._1, r._2)).toSet ===
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
    out.foreach { case (a, b, sa, sb, len) =>
      // anchor-precision bound: within w-1 of the true span ends
      assert(len >= planted.length - 2 * (w - 1), s"span too short: $len")
      assert(len <= planted.length, s"span too long: $len")
      // reported content is EXACTLY equal across the pair (the core
      // exactness contract) and lies inside the planted region
      val ta = docs.filter(col("doc_id") === a).select("text").as[String].head()
      val tb = docs.filter(col("doc_id") === b).select("text").as[String].head()
      assert(ta.substring(sa, sa + len) === tb.substring(sb, sb + len))
      assert(planted.contains(ta.substring(sa, sa + len)))
    }
  }

  test("duplicateSpans reports two separated spans as two chains") {
    val rnd = new scala.util.Random(43)
    def noise(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    // non-periodic fragments: a repeated motif ("ab ab ab…") would match
    // itself at MANY alignments, each a genuine distinct duplicated span
    val p1 = "first shared fragment: " + noise(160)
    val p2 = "second shared fragment: " + noise(140)
    val docs = Seq(
      (1L, p1 + noise(150) + p2),
      (2L, noise(80) + p1 + noise(200) + p2 + noise(40))
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, minLen = 64, k = 16)
      .as[(Long, Long, Int, Int, Int)].collect()
    // the two fragments sit at DIFFERENT alignments -> two chains
    assert(out.length === 2)
    assert(out.forall { case (a, b, _, _, len) =>
      a == 1L && b == 2L && len >= 64 })
  }

  test("cutSpans keeps the first occurrence, excises later ones (merged)") {
    val rnd = new scala.util.Random(53)
    def noise(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val planted = "shared boilerplate that must survive only in its " +
      "first (lowest-id) document and be cut from every later copy: " +
      noise(160)
    val d1 = noise(120) + planted + noise(60)
    val d2 = noise(40) + planted + noise(90)
    val d3 = planted + noise(200)
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, minLen = 64, k = 16)
    val cut = Dedup.cutSpans(docs, spans)
      .as[(Long, String)].collect().toMap
    // doc 1 untouched (always doc_a); docs 2 and 3 lose the plant —
    // anchor-precision may leave <= w-1 edge chars, never the middle
    assert(cut(1L) === d1)
    assert(cut(1L).contains(planted))
    assert(!cut(2L).contains(planted))
    assert(!cut(3L).contains(planted))
    // doc 2 is doc_b of TWO pairs (vs 1 and... no: vs 1 only; doc 3 is
    // doc_b of pairs (1,3) and (2,3) — overlapping cuts must merge:
    // the remaining text is noise plus at most 2(w-1) edge residue
    val w = 64 - 16 + 1
    assert(cut(3L).length <= 200 + 2 * (w - 1))
    assert(cut(3L).length >= 200)
    // the unique noise always survives
    assert(cut(3L).endsWith(d3.substring(d3.length - 200)))
  }

  test("graft_excise merges overlapping and clamps out-of-range cuts") {
    import graft.functions.HashKernels
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def cut(s: String, cuts: (Int, Int)*): String =
      HashKernels.excise(UTF8String.fromString(s),
        new GenericArrayData(cuts.map { case (a, b) =>
          InternalRow(a, b) }.toArray[Any])).toString
    assert(cut("abcdefghij", (2, 3)) === "abfghij")
    assert(cut("abcdefghij", (2, 3), (4, 4)) === "abij")   // overlap merges
    assert(cut("abcdefghij", (0, 100)) === "")             // clamp end
    assert(cut("abcdefghij", (-5, 7)) === "cdefghij")      // clamp start
    assert(cut("abcdefghij", (8, 5), (0, 1)) === "bcdefgh")
    assert(cut("abcdefghij") === "abcdefghij")
  }

  test("winnow guarantee: shared >= w+k-1 substring shares a fingerprint") {
    import graft.functions.HashKernels
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(47)
    def noise(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val k = 8; val w = 20
    (0 until 20).foreach { trial =>
      val shared = noise(w + k - 1) // exactly the guarantee threshold
      val d1 = noise(rnd.nextInt(100)) + shared + noise(rnd.nextInt(100))
      val d2 = noise(rnd.nextInt(100)) + shared + noise(rnd.nextInt(100))
      def hashes(s: String): Set[Long] = {
        val arr = HashKernels.winnow(UTF8String.fromString(s), k, w)
        (0 until arr.numElements()).map(i => arr.getLong(i) >>> 32).toSet
      }
      assert(hashes(d1).intersect(hashes(d2)).nonEmpty,
        s"trial $trial: no shared fingerprint")
    }
    // codegen path (DataFrame) == interpreted kernel
    graft.functions.GraftFunctions.register(spark)
    val txt = noise(300)
    val viaDf = Seq(txt).toDF("t")
      .select(call_function("graft_winnow", col("t"), lit(8), lit(20)))
      .as[Seq[Long]].head()
    val direct = {
      val arr = HashKernels.winnow(UTF8String.fromString(txt), 8, 20)
      (0 until arr.numElements()).map(arr.getLong)
    }
    assert(viaDf === direct)
  }

  test("property: duplicateSpans finds random planted spans, cut removes them") {
    // raw ScalaCheck-style determinism: seeded randoms per trial (the
    // scalatest bridge is off the offline classpath, as PropertiesSpec)
    (1 to 6).foreach { trial =>
      val rnd = new scala.util.Random(1000 + trial)
      def noise(n: Int) =
        (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val minLen = 48 + rnd.nextInt(40)    // 48..87
      val k = 8 + rnd.nextInt(8)           // 8..15
      val w = minLen - k + 1
      val planted = noise(minLen + 2 * w + rnd.nextInt(100))
      val nDocs = 2 + rnd.nextInt(3)
      val docs = (1 to nDocs).map(i =>
        (i.toLong, noise(rnd.nextInt(150)) + planted + noise(rnd.nextInt(150))))
        .toDF("doc_id", "text")
      val spans = Dedup.duplicateSpans(docs, minLen = minLen, k = k)
      val got = spans.select("doc_a", "doc_b").distinct()
        .as[(Long, Long)].collect().toSet
      val want = (for {
        a <- 1 to nDocs; b <- (a + 1) to nDocs
      } yield (a.toLong, b.toLong)).toSet
      assert(got === want, s"trial $trial (minLen=$minLen k=$k)")
      // every reported span's content is identical across its pair
      val texts = docs.as[(Long, String)].collect().toMap
      spans.as[(Long, Long, Int, Int, Int)].collect().foreach {
        case (a, b, sa, sb, len) =>
          assert(texts(a).substring(sa, sa + len) ===
            texts(b).substring(sb, sb + len), s"trial $trial content")
          assert(len >= minLen)
      }
      // cutting leaves the plant only in doc 1 (keep-first), never a
      // full copy elsewhere
      val cut = Dedup.cutSpans(docs, spans).as[(Long, String)].collect().toMap
      assert(cut(1L).contains(planted), s"trial $trial keep-first")
      (2 to nDocs).foreach(i =>
        assert(!cut(i.toLong).contains(planted), s"trial $trial cut $i"))
    }
  }

  test("paragraphDedup keeps first global occurrence, reassembles in order") {
    val docs = Seq(
      (1L, "alpha\n\nbeta\n\ngamma"),
      (2L, "beta\n\ndelta"),        // beta already seen in doc 1
      (3L, "alpha\n\nbeta"),        // nothing new: must vanish entirely
      (4L, "epsilon\n\nalpha\n\nzeta") // middle paragraph deduped away
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(docs)
      .as[(Long, String)].collect().toMap
    assert(out === Map(
      1L -> "alpha\n\nbeta\n\ngamma",
      2L -> "delta",
      4L -> "epsilon\n\nzeta"))
    // within-document duplicate paragraphs dedup too (first position wins)
    val self = Dedup.paragraphDedup(
      Seq((1L, "x\n\ny\n\nx")).toDF("doc_id", "text"))
      .as[(Long, String)].collect().toMap
    assert(self === Map(1L -> "x\n\ny"))
  }

  test("exact keeps smallest id per identical content") {
    val out = Dedup.exact(corpus)
    assert(out.count() === corpus.count() - 2) // 2000/2001 fold into doc 1
    assert(out.filter($"doc_id".isin(2000L, 2001L)).count() === 0)
    assert(out.filter($"doc_id" === 1L).count() === 1)
  }

  test("exactGroups reports group sizes") {
    val g = Dedup.exactGroups(corpus)
      .filter($"n_docs" > 1).select("keep_id", "n_docs")
      .as[(Long, Long)].collect().toSet
    assert(g === Set((1L, 3L)))
  }

  test("minhash near-dup pairs find all planted near-dups, no false pairs") {
    val pairs = Dedup.minhashNearDupPairs(corpus, jaccardThreshold = 0.7)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    val planted = (0 until 40).filter(_ % 4 == 0)
      .map(i => (i.toLong, 1000L + i)).toSet
    val exactPair = Set((1L, 2000L), (1L, 2001L), (2000L, 2001L))
    assert((planted -- pairs).isEmpty, s"missed planted pairs: ${planted -- pairs}")
    assert((pairs -- planted -- exactPair).isEmpty,
      s"unexpected pairs: ${pairs -- planted -- exactPair}")
  }

  test("checkpointed signature table yields the same near-dup pairs") {
    val path = tmpDir("mh-sigs-") + "/sigs"
    Dedup.writeMinhashSignatureTable(corpus, path)
    val fromTable = Dedup.minhashNearDupPairsFromTable(spark, path,
        jaccardThreshold = 0.7)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    val direct = Dedup.minhashNearDupPairs(corpus, jaccardThreshold = 0.7)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    assert(fromTable === direct)
    assert(fromTable.nonEmpty)
  }

  test("minhashDedup removes near-dup losers, keeps winners") {
    val out = Dedup.minhashDedup(corpus, jaccardThreshold = 0.7)
    val kept = out.select("doc_id").as[Long].collect().toSet
    // all 1000+ near-dup ids lose to their base doc
    assert(kept.forall(_ < 2000L) || !kept.exists(id => id >= 1000L && id < 2000L))
    (0 until 40).filter(_ % 4 == 0).foreach { i =>
      assert(kept.contains(i.toLong) && !kept.contains(1000L + i))
    }
  }

  test("simhash blocking recall is exact within the hamming budget") {
    graft.functions.GraftFunctions.register(spark)
    val pairs = Dedup.simhashNearDupPairs(corpus, maxHammingDistance = 6)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    // independently compute the true hamming distance of every pair via a
    // full cross join — the blocked result must match exactly (no recall
    // loss within the budget, no pair beyond it)
    val sigs = corpus.select($"doc_id",
      call_function("graft_simhash",
        TextAnalysis.tokens($"text")).as("sig"))
    val truth = sigs.as("a").join(sigs.as("b"),
        $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"),
        bit_count($"a.sig".bitwiseXOR($"b.sig")).as("h"))
      .filter($"h" <= 6)
      .select("ia", "ib").as[(Long, Long)].collect().toSet
    assert(pairs === truth,
      s"missed: ${truth -- pairs}; extra: ${pairs -- truth}")
    // exact dups have hamming 0 and must always appear
    assert(pairs.contains((2000L, 2001L)))
  }

  test("hammingPairs bucket cap drops degenerate buckets OBSERVABLY") {
    Diagnostics.resetDrops("graft_drops_hamming_chunk")
    // 60 identical signatures: every chunk bucket holds all 60 ids, far
    // over the planted cap of 16 — all buckets drop, zero pairs come out,
    // and the drop accumulator must fire (the silent-loss tripwire)
    val degenerate = (0 until 60).map(i => (i.toLong, 0xDEADBEEFL))
      .toDF("doc_id", "sig")
    val pairs = Dedup.hammingPairs(degenerate, maxHammingDistance = 3,
      maxBucketSize = 16)
    assert(pairs.count() === 0)
    val (dropped, largest) = Diagnostics.lastDrops("graft_drops_hamming_chunk")
      .getOrElse(fail("no hamming_chunk drop stats recorded"))
    assert(dropped >= 1L, "cap drop was not counted")
    assert(largest === 60L, s"largest bucket should be 60, got $largest")
    // under-cap corpus on the DEFAULT cap: nothing drops, pairs intact
    Diagnostics.resetDrops("graft_drops_hamming_chunk")
    val ok = Dedup.hammingPairs(degenerate.limit(5))
    assert(ok.count() === 10) // C(5,2) — all pairs at hamming 0
    val after = Diagnostics.lastDrops("graft_drops_hamming_chunk")
    assert(after.forall(_._1 == 0L), s"unexpected drops: $after")
  }

  test("ngram jaccard matches hand-computed similarity") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"), (3L, "a b c d x"),
      (4L, "p q r s t"),
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, threshold = 0.1)
      .select("doc_id_a", "doc_id_b", "jaccard")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => ((a, b), j) }.toMap
    assert(pairs((1L, 2L)) === 1.0)
    // shingles(1): {abc,bcd,cde}; shingles(3): {abc,bcd,cdx} -> 2/4
    assert(math.abs(pairs((1L, 3L)) - 0.5) < 1e-9)
    assert(!pairs.contains((1L, 4L)))
  }

  test("editDistancePairs: banded verify, inclusive boundary, blocked recall") {
    // edits confined to the FIRST token so the min shingle ("brown fox
    // jumps") — the blocking key — stays shared across all three docs
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "thX quick brown fox jumps"),   // distance 1 to doc 1
      (3L, "tQRSe quick brown fox jumps")  // distance 3 to doc 1
    ).toDF("doc_id", "text")
    val p1 = Dedup.editDistancePairs(docs, maxDistance = 1)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(p1 === Map((1L, 2L) -> 1)) // == maxDistance kept; 3 dropped
    val p4 = Dedup.editDistancePairs(docs, maxDistance = 4)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // banded distances equal the unbanded built-in on every kept pair
    val truth = docs.as[(Long, String)].collect()
    for (Seq((ia, ta), (ib, tb)) <- truth.toSeq.combinations(2)) {
      val d = spark.range(1)
        .select(levenshtein(lit(ta), lit(tb)).as("d")).as[Int].head()
      if (d <= 4)
        assert(p4.get((ia, ib)).contains(d),
          s"banded distance differs for ($ia,$ib): got ${p4.get((ia, ib))}, want $d")
    }
    assert(p4((1L, 3L)) === 3)
  }

  test("wordShingles of short docs fall back to the whole text") {
    val out = spark.range(1).select(
      Dedup.wordShingles(lit("only two"), 3).as("sh"))
      .as[Seq[String]].head()
    assert(out === Seq("only two"))
  }
}
