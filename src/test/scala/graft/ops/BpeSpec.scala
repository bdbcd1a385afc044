package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Distributed BPE training/encoding ([[Bpe]]) pinned against an
  * independent single-threaded reference implementation (the explicit
  * left-to-right merge SCAN, not the fold the engine uses — so the
  * fold-equals-scan argument is tested, not assumed). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------- reference

  /** Greedy left-to-right non-overlapping merge — explicit index scan. */
  private def refApply(v: Vector[String], l: String, r: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < v.length) {
      if (i + 1 < v.length && v(i) == l && v(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += v(i); i += 1 }
    }
    b.result()
  }

  private def refLearn(hist: Map[String, Long], k: Int,
                       minC: Long = 2L): Seq[(String, String, Long)] = {
    var words: Seq[(Vector[String], Long)] = hist.toSeq.map { case (w, f) =>
      (w.split("").toVector :+ Bpe.EndOfWord) -> f
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (out.length < k && !done) {
      val counts = words.flatMap { case (v, f) =>
        v.zip(v.drop(1)).map(p => p -> f)
      }.groupMapReduce(_._1)(_._2)(_ + _)
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        if (c < minC) done = true
        else {
          out += ((l, r, c))
          words = words.map { case (v, f) => refApply(v, l, r) -> f }
        }
      }
    }
    out.toSeq
  }

  // --------------------------------------------------------------- specs

  test("learn matches the reference scan on the classic corpus") {
    // Sennrich et al.'s worked example vocabulary
    val hist = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L,
      "widest" -> 3L)
    val histDf = hist.toSeq.toDF("word", "freq")
    val got = Bpe.learn(histDf, 6)
    val want = refLearn(hist, 6)
    assert(got.map(m => (m.left, m.right, m.pairCount)) === want)
    assert(got.map(_.rank) === (0 until want.length))
  }

  test("fold-based merge equals the explicit scan on overlap-heavy " +
       "sequences") {
    val cases = Seq(
      (Vector("a", "a", "a"), "a", "a"),
      (Vector("a", "a", "a", "a"), "a", "a"),
      (Vector("a", "b", "a", "b"), "a", "b"),
      (Vector("b", "a", "a", "a", "a"), "a", "a"),
      (Vector("a", "b", "b", "a"), "b", "b"),
      (Vector("x"), "a", "b"),
      (Vector.empty[String], "a", "b"))
    cases.foreach { case (v, l, r) =>
      val got = Seq(Tuple1(v)).toDF("sym")
        .select(Bpe.applyMerge(col("sym"), l, r).as("m"))
        .as[Seq[String]].head()
      assert(got === refApply(v, l, r), s"case $v merge ($l,$r)")
    }
  }

  test("learn over a wordHistogram equals learning from explicit counts") {
    val docs = Seq(
      (1L, "low low low lower newest"),
      (2L, "newest newest widest low lower"),
      (3L, "newest widest widest newest low newest")).toDF("doc_id", "text")
    val hist = Bpe.wordHistogram(docs, "text")
    val histMap = hist.as[(String, Long)].collect().toMap
    assert(Bpe.learn(hist, 5).map(m => (m.left, m.right, m.pairCount))
      === refLearn(histMap, 5))
  }

  test("early stop: minPairCount ends training before numMerges") {
    val histDf = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "freq")
    // every adjacent pair occurs once; min of 2 admits nothing
    assert(Bpe.learn(histDf, 10, minPairCount = 2L) === Seq.empty)
    // min of 1 merges everything down to whole-word symbols:
    // 2 words x 2 merges each ((chars), (+</w>)) = 4 merges, then done
    val all = Bpe.learn(histDf, 10, minPairCount = 1L)
    assert(all.nonEmpty && all.length <= 6)
  }

  test("encode: document tokens detokenize back to the normalized text " +
       "and compress vs characters") {
    val docs = Seq(
      (1L, "low low low lower newest"),
      (2L, "Newest  NEWEST widest low lower"),
      (3L, "newest widest widest newest low newest")).toDF("doc_id", "text")
    val merges = Bpe.learn(Bpe.wordHistogram(docs, "text"), 8)
    assert(merges.nonEmpty)
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
      .withColumn("detok",
        trim(replace(concat_ws("", col("bpe_tokens")),
          lit(Bpe.EndOfWord), lit(" "))))
      .join(docs, Seq("doc_id"))
    val rows = enc.select("doc_id", "detok", "text", "bpe_tokens")
      .as[(Long, String, String, Seq[String])].collect()
    assert(rows.length === 3)
    rows.foreach { case (id, detok, text, toks) =>
      val norm = text.trim.toLowerCase.split("\\s+").mkString(" ")
      assert(detok === norm, s"doc $id must detokenize losslessly")
      // merges learned on this corpus must actually compress
      assert(toks.length < norm.replace(" ", "").length + norm.split(" ").length,
        s"doc $id: token count must undercut char+marker count")
    }
  }

  test("encode positions survive shuffling: word order is by document " +
       "position, not arrival order") {
    val docs = Seq((1L, "zz aa zz bb")).toDF("doc_id", "text")
      .repartition(7)
    val merges = Bpe.learn(Bpe.wordHistogram(docs, "text"), 2)
    val toks = Bpe.encode(docs, "doc_id", "text", merges)
      .select("bpe_tokens").as[Seq[String]].head()
    val detok = toks.mkString("").replace(Bpe.EndOfWord, " ").trim
    assert(detok === "zz aa zz bb")
  }

  test("a deep merge list crosses lineage-cut boundaries without " +
       "changing results") {
    // enough distinct repetition to learn > LineageCutEvery merges
    val word = "abcdefghijklmnopqrst" // 20 chars -> many frequent pairs
    val hist = Map(word -> 10L, word.reverse -> 9L, (word + "x") -> 8L)
    val got = Bpe.learn(hist.toSeq.toDF("word", "freq"),
      Bpe.LineageCutEvery + 5, minPairCount = 1L)
    val want = refLearn(hist, Bpe.LineageCutEvery + 5, minC = 1L)
    assert(got.map(m => (m.left, m.right, m.pairCount)) === want)
  }
}
