package graft.ops

import graft.SparkSpec

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  test("overlap counts: hashed == unhashed == hand truth") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "totally unrelated text here now"),
      (3L, "the quick brown cat sits")).toDF("doc_id", "text")
    val evalSet = Seq("the quick brown fox ran away").toDF("text")
    def run(hashed: Boolean) =
      Contamination.overlapCounts(train, evalSet, n = 3, hashed = hashed)
        .as[(Long, Long)].collect().toMap
    val hashedOut = run(true)
    assert(run(false) === hashedOut)
    // eval 3-grams: {the quick brown, quick brown fox, brown fox ran,
    // fox ran away}; doc1 shares the first two, doc3 shares one, doc2 none
    assert(hashedOut === Map(1L -> 2L, 3L -> 1L))
  }
}
