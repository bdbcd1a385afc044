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

  test("all custom expressions COMPILE under codegen (no silent fallback)") {
    GraftFunctions.register(spark)
    // spark.sql.codegen.fallback=false makes a janino compile failure in
    // any doGenCode THROW instead of silently degrading to interpreted
    // eval — without this pin a broken generated-code path would pass
    // every equality spec via the fallback
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val planes = typedlit(Seq(Seq(1.0, -1.0), Seq(0.5, 0.5)))
      // spark.range input (NOT a local Seq): the optimizer constant-folds
      // a projection over a LocalRelation at plan time, which would skip
      // codegen entirely and void this pin
      val out = spark.range(2)
        .select($"id",
          array(lit("a"), concat(lit("b"), $"id".cast("string")),
            lit("c"), lit("d")).as("toks"),
          array($"id".cast("double") * 0.3 - 1.0,
            $"id".cast("double") * 0.5 + 0.1).as("vec"))
        .select(
          call_function("graft_minhash", $"toks", lit(8)).as("mh"),
          call_function("graft_word_shingles", $"toks", lit(2)).as("ws"),
          call_function("graft_shingle_hashes", $"toks", lit(2)).as("sh"),
          call_function("graft_minhash_hashes",
            call_function("graft_shingle_hashes", $"toks", lit(2)),
            lit(8)).as("mhh"),
          call_function("graft_simhash", $"toks").as("sim"),
          call_function("graft_lsh_bucket", $"vec", planes).as("lsh"),
          call_function("graft_nearest_cell", $"vec", planes).as("cell"))
      assert(out.collect().length === 2)
      // and the generated source really calls the kernels (the fallback
      // path embeds an eval() call on an expression reference instead)
      val code = org.apache.spark.sql.execution.debug.codegenString(
        out.queryExecution.executedPlan)
      assert(code.contains("HashKernels"),
        "generated code does not call HashKernels — fallback crept back in")
    } finally spark.conf.set(key, prev)
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
