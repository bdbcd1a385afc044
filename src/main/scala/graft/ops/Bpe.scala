package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING and encoding —
  * the "token counting (BPE-ish regex)" estimate graduated into a real
  * learned subword vocabulary (Sennrich, Haddow & Birch 2016, "Neural
  * Machine Translation of Rare Words with Subword Units"; the training
  * recipe GPT-2/RoBERTa-style tokenizers descend from).
  *
  * '''Why this shape scales to 100 TB.''' BPE never iterates over the
  * corpus: it iterates over the WORD HISTOGRAM. The corpus is touched
  * exactly once ([[wordHistogram]] — one explode + one groupBy, the
  * same movement as a word count), and every one of the K merge
  * rounds is a map + aggregation over the histogram relation, whose
  * size is the number of DISTINCT words (≈10⁷–10⁸ rows for a
  * trillion-token crawl — a few GB, trivially distributed, laughably
  * parallel). Training cost is therefore O(corpus) + K·O(vocab), the
  * published algorithm's own complexity, with no driver-side state
  * beyond the K learned merges themselves (a few KB).
  *
  * '''Determinism.''' The argmax pair is tie-broken (count DESC, left
  * ASC, right ASC — binary string order), so the learned merge table
  * is a pure function of the histogram: identical across runs,
  * partitionings, and engines. The driver's DuckDB oracle replays the
  * whole K-round loop relationally and hash-matches the merges
  * (`q_bpe_merges`) and the resulting encodings (`q_bpe_encode`).
  *
  * '''Greedy-fold = greedy-scan.''' One merge round replaces adjacent
  * (l, r) symbol pairs left-to-right without overlap. The fold below
  * (merge-with-last-emitted) is exactly that scan: a just-merged last
  * element can never equal `l` again within the round (that would
  * need `l + r == l`, impossible for nonempty `r`), so the fold never
  * double-consumes a symbol. `a a a` under (a,a) → `aa a`, and
  * `a b a b` under (a,b) → `ab ab`, matching the reference
  * implementation's re.sub scan.
  */
object Bpe {

  /** End-of-word marker symbol (a multi-char symbol, so it can never
    * collide with an initial single-character symbol). */
  val EndOfWord = "</w>"

  final case class Merge(rank: Int, left: String, right: String,
                         pairCount: Long) {
    def merged: String = left + right
  }

  /** The corpus's word histogram — the ONLY corpus-sized pass in BPE
    * training. Tokenization mirrors [[TextAnalysis.tokens]]
    * (lowercase + whitespace split) so token statistics and the
    * tokenizer agree on what a word is. */
  def wordHistogram(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** A word's initial symbol sequence: its characters plus the
    * end-of-word marker (`low` → [l, o, w, &lt;/w&gt;]). */
  def initialSymbols(word: Column): Column =
    concat(split(word, ""), array(lit(EndOfWord)))

  /** One merge round applied to a symbol array: greedy left-to-right
    * replacement of adjacent (l, r) with l+r, as a fold over the
    * array (see the object doc for the equivalence argument). A
    * higher-order-function expression — row-local, no shuffle. */
  def applyMerge(sym: Column, l: String, r: String): Column =
    aggregate(sym, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Learn up to `numMerges` merges from a (word, freq) histogram.
    * Each round is ONE Spark job over the histogram: adjacent-pair
    * counts (explode + groupBy) with a deterministic argmax, then the
    * winning pair folds into every word's symbols. Stops early when
    * the best pair's count drops below `minPairCount` (the histogram
    * has no repetition left worth a vocabulary slot). Lineage is cut
    * every [[LineageCutEvery]] rounds so the plan stays bounded — the
    * same discipline as [[Components]]' propagation rounds. */
  def learn(hist: DataFrame, numMerges: Int,
            minPairCount: Long = 2L): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var words = hist
      .select(initialSymbols(col("word")).as("sym"),
        col("freq").cast("long").as("freq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var i = 0
      var done = false
      while (i < numMerges && !done) {
        val best = pairCounts(words)
          .orderBy(col("c").desc, col("l").asc, col("r").asc)
          .limit(1).collect()
        best.headOption.filter(_.getLong(2) >= minPairCount) match {
          case None => done = true // nothing left to merge
          case Some(row) =>
            val m = Merge(i, row.getString(0), row.getString(1),
              row.getLong(2))
            out += m
            val nextRaw = words.select(
              applyMerge(col("sym"), m.left, m.right).as("sym"),
              col("freq"))
            // cut lineage periodically: each round nests one more
            // fold expression; unbounded nesting would grow analysis
            // and codegen cost linearly in K
            val next =
              (if ((i + 1) % LineageCutEvery == 0) nextRaw.localCheckpoint()
               else nextRaw)
                .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            val prev = words
            words = next
            prev.unpersist()
            i += 1
        }
      }
      out.toSeq
    } finally { words.unpersist(); () }
  }

  /** Rounds between lineage cuts in [[learn]]/[[encodeWords]]. */
  val LineageCutEvery = 16

  /** Adjacent symbol-pair counts of a (sym, freq) frame — one explode
    * + one aggregation; map-side partial aggregation keeps the shuffle
    * at pair-vocabulary size. */
  private def pairCounts(words: DataFrame): DataFrame =
    words.select(
        // guard single-symbol words: sequence(1, 0) DESCENDS, and the
        // element_at probes would run off the array — a fully-merged
        // word simply contributes no pairs (explode drops its empty
        // array, exactly the reference behavior)
        explode(when(size(col("sym")) > 1,
            transform(sequence(lit(1), size(col("sym")) - 1),
              i => struct(element_at(col("sym"), i).as("l"),
                element_at(col("sym"), i + 1).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>")))
          .as("p"),
        col("freq"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("freq").as("c"))

  /** The learned merges as a relation (rank, lft, rgt, pair_count) —
    * the durable artifact a tokenizer ships as `merges.txt`. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "lft", "rgt", "pair_count")
  }

  /** Encode DISTINCT words: apply every merge in rank order to each
    * word's symbols. This is the per-word greedy encode real BPE
    * tokenizers run — and the scale-correct place to pay it: cost is
    * O(vocab × K), never O(corpus × K); the corpus reaches its tokens
    * through a join against this dictionary ([[encode]]). Merges fold
    * into nested expressions in batches of [[LineageCutEvery]] with a
    * lineage cut between batches. */
  def encodeWords(words: DataFrame, merges: Seq[Merge],
                  wordCol: String = "word"): DataFrame = {
    var df = words.withColumn("toks", initialSymbols(col(wordCol)))
    merges.grouped(LineageCutEvery).foreach { batch =>
      val folded = batch.foldLeft(col("toks")) { (c, m) =>
        applyMerge(c, m.left, m.right)
      }
      df = df.withColumn("toks", folded)
      if (batch.sizeIs == LineageCutEvery) df = df.localCheckpoint()
    }
    df
  }

  /** Tokenize a corpus with a learned merge list: per-document BPE
    * tokens, in document order. The expensive loop runs once per
    * DISTINCT word ([[encodeWords]]); documents then join their words
    * to the dictionary and reassemble in position order — two
    * shuffles (the dictionary join and the per-doc regroup), both on
    * corpus-partitioned keys, no skew pitfalls beyond what the word
    * distribution itself carries (the dictionary side is vocab-sized
    * and broadcast-eligible under AQE). */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    val positioned = df.select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol)))
          .as(Seq("pos", "word")))
      .filter(length(col("word")) > 0)
    val dict = encodeWords(positioned.select("word").distinct(), merges)
    positioned.join(dict, Seq("word"))
      .groupBy(idCol)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("toks")))),
        s => s.getField("toks"))).as("bpe_tokens"))
  }
}
