package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the train-vs-eval n-gram overlap check
  * every LLM training pipeline runs before a data release (detecting eval
  * questions that leaked into the training corpus).
  *
  * Shape: per-document distinct word `n`-gram shingles on both sides
  * (reusing [[Dedup.wordShingles]], so the dedup and decontamination
  * stacks share one shingling definition), then a join on the shingle and
  * a per-train-doc count of distinct overlapping shingles.
  *
  * Scale: the eval corpus is small by construction (thousands of docs vs
  * billions) — its distinct shingle set broadcasts, so the check is
  * MAP-SIDE over the training corpus: no shuffle of training data at all.
  * With `hashed = true` (default) the join key is the xxhash64 of the
  * shingle — 8 bytes instead of the n-gram text — which is what you want
  * at 100 TB; a 64-bit collision (~2e-20 per pair) can only ever
  * over-count an overlap, never miss one.
  */
object Contamination {

  /** (idCol, n_overlapping_shingles) per train document that shares at
    * least one `n`-gram with `evalSet`. Docs absent from the result are
    * clean. */
  def overlapCounts(train: DataFrame, evalSet: DataFrame, n: Int = 3,
                    idCol: String = "doc_id", textCol: String = "text",
                    hashed: Boolean = true): DataFrame = {
    // hashed path: the codegen'd graft_shingle_hashes expression — ONE
    // tight loop per row (same ~20x constant over interpreted HOF
    // shingling that the MinHash stack buys); per-doc distinctness
    // matches wordShingles' array_distinct, so counts agree with the
    // string path (pinned by PackingSpec)
    graft.functions.GraftFunctions.register(train.sparkSession)
    def shingleArr(c: org.apache.spark.sql.Column) =
      if (hashed) call_function("graft_shingle_hashes",
        TextAnalysis.tokens(c), lit(n))
      else Dedup.wordShingles(c, n)
    val trainSh = train
      .select(col(idCol), explode(shingleArr(col(textCol))).as("shingle"))
    val evalSh = evalSet
      .select(explode(shingleArr(col(textCol))).as("shingle"))
      .distinct()
    trainSh.join(broadcast(evalSh), Seq("shingle"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_overlapping_shingles")) // distinct per doc
  }
}
