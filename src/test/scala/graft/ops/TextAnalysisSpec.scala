package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def eval1[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c.as("v")).collect().head.getAs[T]("v")

  test("tokenCount: whitespace tokens, empty text is 0") {
    assert(eval1[Int](TextAnalysis.tokenCount(lit("Hello  world foo"))) === 3)
    assert(eval1[Int](TextAnalysis.tokenCount(lit(""))) === 0)
    assert(eval1[Int](TextAnalysis.tokenCount(lit("   "))) === 0)
  }

  test("bpeishTokenCount: alpha runs + digit runs + punct marks") {
    // "it's 2025!" -> [it][']['s][2025][!] = 5
    assert(eval1[Int](TextAnalysis.bpeishTokenCount(lit("it's 2025!"))) === 5)
  }

  test("stopwordRatio and punctRatio") {
    val r = eval1[Double](TextAnalysis.stopwordRatio(lit("the cat and the dog")))
    assert(math.abs(r - 3.0 / 5.0) < 1e-12)
    val p = eval1[Double](TextAnalysis.punctRatio(lit("ab.,")))
    assert(math.abs(p - 0.5) < 1e-12)
  }

  test("qualityScore is in [0,1] and favors clean English prose") {
    val good = eval1[Double](TextAnalysis.qualityScore(
      lit("the quick brown fox jumps over the lazy dog and runs to the hills " * 8)))
    val bad = eval1[Double](TextAnalysis.qualityScore(lit("!!! ??? ### $$$")))
    assert(good > bad && good <= 1.0 && bad >= 0.0)
  }

  test("langId picks the language with most stopword hits, und when none") {
    assert(eval1[String](TextAnalysis.langId(lit("the cat is on the mat"))) === "en")
    assert(eval1[String](TextAnalysis.langId(lit("der hund ist nicht da und"))) === "de")
    assert(eval1[String](TextAnalysis.langId(lit("el perro es un animal"))) === "es")
    assert(eval1[String](TextAnalysis.langId(lit("zzz qqq xxx"))) === "und")
  }

  test("fingerprint is order-insensitive; rollingHash is order-sensitive") {
    val fp1 = eval1[String](TextAnalysis.fingerprint(lit("b a c")))
    val fp2 = eval1[String](TextAnalysis.fingerprint(lit("c b a a")))
    assert(fp1 === fp2) // same distinct token set
    val rh1 = eval1[Long](TextAnalysis.rollingHash(lit("a b c")))
    val rh2 = eval1[Long](TextAnalysis.rollingHash(lit("c b a")))
    assert(rh1 !== rh2)
  }

  test("redact replaces every email and URL, leaves clean text alone") {
    val red = eval1[String](TextAnalysis.redact(
      lit("mail a.b+c@ex-1.org or x@y.io, see https://a.b/c?d=1 and http://z.io plain")))
    assert(red === "mail <EMAIL> or <EMAIL>, see <URL> and <URL> plain")
    assert(eval1[String](TextAnalysis.redact(lit("no pii here"))) ===
      "no pii here")
  }

  test("documentStats projects all features without shuffle") {
    val docs = Seq((1L, "the cat sat"), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.documentStats(docs)
    assert(out.columns.toSet.intersect(Set("char_count", "token_count",
      "quality_score", "lang_pred", "fingerprint")).size === 5)
    assert(out.count() === 2)
    // map-only: no Exchange in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("repetitionStats: duplicate and top-bigram fractions by hand") {
    val docs = Seq(
      (1L, "spam spam spam spam"),   // 1 distinct of 4; bigram "spam spam" 3/3
      (2L, "all words are unique"),  // 0 dup; every bigram count 1 → 1/3
      (3L, "one")).toDF("doc_id", "text") // < 2 tokens → bigram frac 0
    val out = TextAnalysis.repetitionStats(docs)
      .select("doc_id", "n_tokens", "dup_token_frac", "top_bigram_frac")
      .as[(Long, Int, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) === ((4, 0.75, 1.0)))
    assert(out(2L)._2 === 0.0)
    assert(out(2L)._3 === (1.0 / 3.0))
    assert(out(3L) === ((1, 0.0, 0.0)))
  }

  test("canonicalizeUrl: tracking params, www, fragment, slash, case") {
    def canon(u: String): String =
      eval1[String](TextAnalysis.canonicalizeUrl(org.apache.spark.sql
        .functions.lit(u)))
    assert(canon("https://WWW.Example.COM/Path/?utm_source=x&id=1&fbclid=z#f")
      === "https://example.com/Path/?id=1")
    assert(canon("http://example.com/") === "http://example.com")
    assert(canon("https://example.com/a/b") === "https://example.com/a/b")
    // path case preserved; only scheme+host lowered
    assert(canon("HTTPS://EX.COM/CaseSensitive") ===
      "https://ex.com/CaseSensitive")
    // variants collapse to one key
    assert(canon("https://www.ex.com/p?utm_campaign=a") ===
      canon("https://ex.com/p"))
    // anchored tracking pattern: "refbclid" is NOT a tracking param
    assert(canon("https://ex.com/p?refbclid=7&id=1") ===
      "https://ex.com/p?refbclid=7&id=1")
    // adjacent tracking params all strip
    assert(canon("https://ex.com/p?utm_a=1&utm_b=2&id=3") ===
      "https://ex.com/p?id=3")
    assert(canon("https://ex.com/p?id=3&gclid=z&utm_x=1") ===
      "https://ex.com/p?id=3")
    // scheme-less crawl entries still canonicalize
    assert(canon("WWW.Ex.com/p") === "ex.com/p")
  }

  test("tfidf: weights match hand computation") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry date")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(docs)
      .select("doc_id", "term", "tf", "df", "tfidf")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // Catalyst math exprs use StrictMath (reproducible across JVMs) —
    // expectations must too, Math.log differs by 1 ulp
    assert(out((1L, "apple")) === ((2L, 1L, 2.0 * StrictMath.log(3.0 / 1.0))))
    assert(out((1L, "banana")) === ((1L, 2L, 1.0 * StrictMath.log(3.0 / 2.0))))
    assert(out((3L, "cherry")) === ((2L, 2L, 2.0 * StrictMath.log(3.0 / 2.0))))
    assert(out((3L, "date"))._3 === StrictMath.log(3.0))
    assert(out.size === 6)
  }

  test("bigramCrossEntropy: hand-computed Laplace math; ranks noise above prose") {
    val ref = Seq((1L, "the cat sat"), (2L, "the cat ran")).toDF("doc_id", "text")
    // reference model: unigrams the->2 cat->2 sat->1 ran->1 (V=4);
    // bigrams (the,cat)->2 (cat,sat)->1 (cat,ran)->1
    val docs = Seq(
      (10L, "the cat sat"),   // all bigrams seen
      (11L, "zig zag"),       // nothing seen
      (12L, "x")              // < 2 tokens: unscorable, drops out
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramCrossEntropy(ref, docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val lp1 = StrictMath.log((2 + 1.0) / (2 + 4.0)) / StrictMath.log(2.0)
    val lp2 = StrictMath.log((1 + 1.0) / (2 + 4.0)) / StrictMath.log(2.0)
    val expect10 = BigDecimal(-(lp1 + lp2) / 2.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(10L)._1 === 2L)
    assert(math.abs(out(10L)._2 - expect10) < 1e-9)
    // fully-unseen bigram: p = 1/V = 1/4 -> 2 bits exactly
    assert(out(11L) === ((1L, 2.0)))
    assert(!out.contains(12L))
    assert(out(11L)._2 > out(10L)._2) // noise scores worse than prose
  }
}
