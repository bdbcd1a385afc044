package graft.functions

import graft.SparkSpec
import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

class HashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "pack my box with five dozen liquor jugs"),
    (3L, ""),
  ).toDF("doc_id", "text")

  test("graft_minhash equals the higher-order-function formulation") {
    GraftFunctions.register(spark)
    val sh = Dedup.wordShingles($"text", 3)
    val out = docs.select(
      call_function("graft_minhash",
        sh, lit(16)).as("fast"),
      Dedup.minhashSignatureFromHashes(
        transform(sh, s => xxhash64(s)), 16).as("slow"))
      .as[(Seq[Long], Seq[Long])].collect()
    out.foreach { case (fast, slow) => assert(fast === slow) }
  }

  test("graft_simhash equals the higher-order-function formulation") {
    GraftFunctions.register(spark)
    val out = docs.filter(length($"text") > 0).select(
      call_function("graft_simhash", TextAnalysis.tokens($"text")).as("fast"),
      Dedup.simhash($"text").as("slow"))
      .as[(Long, Long)].collect()
    out.foreach { case (fast, slow) => assert(fast === slow) }
  }

  test("registration is idempotent and arg validation rejects bad usage") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    assertThrows[Exception] {
      docs.select(call_function("graft_minhash", $"text")).collect()
    }
  }

  test("graft_word_shingles equals the higher-order wordShingles formulation") {
    GraftFunctions.register(spark)
    val out = docs.select(
      call_function("graft_word_shingles",
        TextAnalysis.tokens($"text"), lit(3)).as("fast"),
      Dedup.wordShingles($"text", 3).as("slow"))
      .as[(Seq[String], Seq[String])].collect()
    out.foreach { case (fast, slow) => assert(fast === slow) }
  }

  test("graft_shingle_hashes matches wordShingles cardinality and jaccard") {
    GraftFunctions.register(spark)
    val pairs = Seq(
      ("a b c d e f", "a b c d e f"),     // identical
      ("a b c d e f", "a b c d e x"),     // overlap
      ("a b c d e f", "p q r s t u"),     // disjoint
      ("a b", "a b"),                      // short-doc fallback
    ).toDF("t1", "t2")
    def jac(sh1: org.apache.spark.sql.Column, sh2: org.apache.spark.sql.Column) =
      size(array_intersect(sh1, sh2)).cast("double") /
        size(array_union(sh1, sh2)).cast("double")
    val out = pairs.select(
      jac(call_function("graft_shingle_hashes", TextAnalysis.tokens($"t1"), lit(3)),
          call_function("graft_shingle_hashes", TextAnalysis.tokens($"t2"), lit(3))).as("jh"),
      jac(Dedup.wordShingles($"t1", 3), Dedup.wordShingles($"t2", 3)).as("js"))
      .as[(Double, Double)].collect()
    out.foreach { case (jh, js) => assert(math.abs(jh - js) < 1e-12) }
  }

  test("minhash signature is stable across rows with identical shingles") {
    GraftFunctions.register(spark)
    val sig = Seq(("a b c d"), ("a b c d")).toDF("text")
      .select(call_function("graft_minhash",
        Dedup.wordShingles($"text", 3), lit(32)).as("sig"))
      .as[Seq[Long]].collect()
    assert(sig(0) === sig(1))
  }
}
