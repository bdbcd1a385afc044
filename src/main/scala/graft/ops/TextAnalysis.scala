package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, document
  * fingerprinting. All are built from codegen'd built-in functions
  * (split / regexp / higher-order array functions) — no UDFs — so they
  * stay inside whole-stage codegen and scale linearly with a single scan,
  * no shuffle.
  */
object TextAnalysis {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(tokens(text)))

  /** BPE-ish subword-token estimate: alpha runs, digit runs, and single
    * punctuation marks each count as one token (a common pre-tokenizer
    * approximation when no tokenizer model is available). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column = {
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    when(length(text) > 0, punct.cast("double") / length(text).cast("double"))
      .otherwise(lit(0.0))
  }

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be", "this")

  /** Fraction of tokens that are (English) stopwords. */
  def stopwordRatio(text: Column,
                    stopwords: Seq[String] = EnglishStopwords): Column = {
    val toks = tokens(text)
    val sw = size(filter(toks, t => t.isin(stopwords: _*)))
    when(size(toks) > 0, sw.cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: favors mid-length documents with a
    * healthy stopword ratio and low punctuation density (the standard
    * heuristic trio used by web-scale corpus filters). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val swScore = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    val punctPenalty = greatest(lit(1.0) - punctRatio(text) * lit(5.0), lit(0.0))
    ((lenScore + swScore + punctPenalty) / lit(3.0))
  }

  private val StopwordsByLang: Map[String, Seq[String]] = Map(
    "en" -> EnglishStopwords,
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "zu", "mit", "auf", "für", "von", "den", "im"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de", "des",
      "dans", "pour", "que", "qui", "au", "pas"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "de",
      "en", "por", "que", "no", "con", "para"),
  )

  /** N-gram-free language ID heuristic: score each candidate language by
    * its stopword hit-count in the token stream; ties and zero scores →
    * "und" (undetermined). One projection, no shuffle. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = StopwordsByLang.toSeq.sortBy(_._1).map { case (lang, sw) =>
      struct(size(filter(toks, t => t.isin(sw: _*))).as("score"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Order-insensitive content fingerprint: md5 over the sorted distinct
    * token set (the classic "fingerprint" clustering key from record-
    * linkage literature). Portable: identical result is computable in any
    * engine with md5 — used by the DuckDB oracle. */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Rolling hash over the token sequence — order-SENSITIVE fingerprint.
    * Chained xxhash64 (hash of previous state + next token) rather than a
    * polynomial accumulator: same collision properties, and no 64-bit
    * overflow (Spark 4 runs ANSI mode, where wrap-around multiply throws). */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => xxhash64(acc, t))

  /** PII-style redaction patterns (portable RE2-compatible regexes, so the
    * same patterns run in any engine — the DuckDB oracle uses them
    * verbatim). The standard first-pass scrub of a web corpus before
    * training: emails and URLs replaced by stable placeholder tokens. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"

  /** Replace emails then URLs with placeholder tokens. Map-only, codegen. */
  def redact(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"),
      UrlRe, "<URL>")

  /** Word n-grams WITH repetitions (unlike `Dedup.wordShingles`, which
    * dedups for set semantics) — repetition analysis needs the counts.
    * Fewer than `n` tokens → no n-grams (empty array, NOT a short
    * shingle: sequence(0, negative) would go descending). */
  def ngramList(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Fraction of tokens that are repeats of an earlier token: 1 -
    * distinct/total. Map-only. */
  def duplicateTokenFraction(text: Column): Column = {
    val toks = tokens(text)
    lit(1.0) - size(array_distinct(toks)).cast("double") /
      size(toks).cast("double")
  }

  /** Most-frequent-bigram share of a document, MAP-ONLY: sort the
    * bigram array and take the longest equal run via one aggregate pass
    * (same value as a groupBy-count formulation, zero shuffle — the
    * per-doc statistic must not shuffle every bigram of a 100 TB
    * corpus). < 2 tokens → 0. */
  def topBigramFraction(text: Column): Column = {
    val grams = array_sort(ngramList(text, 2))
    val run = aggregate(grams,
      struct(lit(0).as("best"), lit(0).as("cur"),
        lit("").cast("string").as("prev")),
      (acc, x) => {
        val cur = when(x === acc("prev"), acc("cur") + 1).otherwise(lit(1))
        struct(greatest(acc("best"), cur).as("best"), cur.as("cur"),
          x.as("prev"))
      })
    when(size(grams) === 0, lit(0.0))
      .otherwise(run("best").cast("double") / size(grams).cast("double"))
  }

  /** Gopher-style repetition filters: per doc, token count, duplicate-
    * token fraction and most-frequent-bigram fraction — a doc whose top
    * bigram covers a large share of all bigrams is boilerplate/spam (the
    * standard pretraining quality cut). Fully map-only projection. */
  def repetitionStats(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      tokenCount(col(textCol)).as("n_tokens"),
      duplicateTokenFraction(col(textCol)).as("dup_token_frac"),
      topBigramFraction(col(textCol)).as("top_bigram_frac"))

  /** TF-IDF term weights per (document, term): tf = raw in-doc term
    * count, idf = ln(N / df) over the corpus. Two shuffles total — one
    * groupBy (doc, term) for tf, one groupBy term for df — then the
    * per-term df joins back onto the tf rows. The df side is UNHINTED
    * deliberately: a term dictionary is usually far smaller than the
    * corpus and AQE converts the join to a broadcast at runtime from
    * the df aggregate's ACTUAL size — but web-scale vocabularies grow
    * with the corpus (Heap's law: noise, URLs, typos), and a forced
    * broadcast hint would drive a multi-GB dictionary into the 8GB
    * broadcast / driver ceiling where AQE's runtime decision simply
    * keeps the shuffle. Same gating philosophy as JoinMv's dim-slice
    * cap. The doc count N is one scalar agg, not a per-row window. */
  def tfidf(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    // N rides along as a broadcast one-row cross join: the operator stays
    // LAZY (no count() action at plan-construction time, no extra pass)
    val n = docs.agg(count(lit(1)).cast("double").as("__n"))
    val terms = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(idCol, "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term")
      .agg(count(lit(1)).as("df")) // tf rows are distinct per (doc, term)
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf") * log(col("__n") / col("df")))
      .drop("__n")
  }

  /** Crawl-style URL canonicalization — the dedup key for URL-level
    * dedup before content-level passes: lowercases scheme+host, strips
    * `www.`, the fragment, common tracking params (utm_*, fbclid,
    * gclid), empty query remnants, and the trailing slash. Path and
    * query VALUE case are preserved (they are semantically significant).
    * Map-only regex chain, engine-portable (mirrored in the
    * `q_url_canon` DuckDB oracle). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // scheme optional so bare-host crawl entries ("www.ex.com/p")
    // canonicalize too; a path-only input has no host and passes through
    val hostPat = "^((?:[A-Za-z][A-Za-z0-9+.-]*://)?[^/?]+)"
    val host = regexp_replace(
      lower(regexp_extract(noFrag, hostPat, 1)),
      "^(www\\.|([A-Za-z][A-Za-z0-9+.-]*://)www\\.)", "$2")
    val rest = regexp_replace(noFrag, hostPat, "")
    // tracking params: anchored on a separator (an unanchored pattern
    // would eat substrings of longer names, e.g. "refbclid"); the
    // separator is KEPT and duplicates collapsed after, so adjacent
    // tracking params all strip
    val noTrack = regexp_replace(rest,
      "([?&])(utm_[A-Za-z]+|fbclid|gclid)=[^&#]*", "$1")
    val tidyQ = regexp_replace(regexp_replace(regexp_replace(noTrack,
      "\\?[?&]+", "?"), "&[?&]+", "&"), "[?&]+$", "")
    val noSlash = regexp_replace(tidyQ, "/$", "")
    concat(host, noSlash)
  }

  /** Non-empty whitespace tokens as an array column. */
  private def cleanTokens(text: Column): Column =
    filter(tokens(text), t => length(t) > 0)

  /** Adjacent token pairs of a document — empty for < 2 tokens. Built
    * from native `slice` + `arrays_zip` (single codegen'd expressions;
    * a `transform(sequence…, element_at…)` formulation pays one
    * interpreted lambda dispatch PER TOKEN — the same overhead the
    * custom hash kernels exist to avoid). The cast names the zip's
    * positional fields. */
  private def bigramsOf(text: Column): Column = {
    val toks = cleanTokens(text)
    when(size(toks) >= 2,
      arrays_zip(slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1))
        .cast("array<struct<w1:string,w2:string>>"))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
  }

  /** CCNet-style language-model quality scoring (Wenzek et al. 2020:
    * score web text by perplexity under a reference LM; keep the
    * reference-like tail): fit a Laplace-smoothed token-BIGRAM model on
    * `reference`, score every `docs` row by per-bigram cross-entropy in
    * bits — low ≈ reference-like prose, high ≈ noise, boilerplate,
    * wrong-language. Returns (idCol, n_bigrams, xent4); documents with
    * fewer than two tokens have no bigrams and drop out (unscorable).
    *
    * Scale shape: the model is two RELATIONS (bigram and unigram
    * counts) joined by token keys — never a broadcast vocabulary or a
    * driver-side model, so a trillion-token reference shuffles instead
    * of OOMing the driver; the one scalar (vocabulary size, Laplace
    * denominator) rides a broadcast crossJoin like the other corpus
    * scalars. Scoring is explode → two shuffled joins → one grouped
    * average: the plain map-reduce shape. */
  def bigramCrossEntropy(reference: DataFrame, docs: DataFrame,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    val refBi = reference
      .select(explode(bigramsOf(col(textCol))).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c12"))
    // persisted: BOTH the scoring join and the vocabulary scalar read
    // the unigram model — without the cache the reference corpus is
    // tokenized and aggregated twice (same caller contract as the
    // near-dup signature caches: long-lived sessions clearCache between
    // calls; at cluster scale checkpoint the model relations instead)
    val refUni = reference
      .select(explode(cleanTokens(col(textCol))).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = refUni.agg(count(lit(1)).as("v"))
    docs.select(col(idCol), explode(bigramsOf(col(textCol))).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .join(refBi, Seq("w1", "w2"), "left")
      .join(refUni, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        log2((coalesce(col("c12"), lit(0L)) + lit(1.0)) /
          (coalesce(col("c1"), lit(0L)) + col("v").cast("double")))
          .as("lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(-avg(col("lp")), 4).as("xent4"))
  }

  /** Full per-document stats projection over a corpus. */
  def documentStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(
      col("*"),
      length(t).as("char_count"),
      tokenCount(t).as("token_count"),
      bpeishTokenCount(t).as("bpeish_token_count"),
      punctRatio(t).as("punct_ratio"),
      stopwordRatio(t).as("stopword_ratio"),
      qualityScore(t).as("quality_score"),
      langId(t).as("lang_pred"),
      fingerprint(t).as("fingerprint"),
    )
  }
}
