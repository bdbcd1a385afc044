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

  test("eval shingle set joins BROADCAST (map-side over the train corpus)") {
    import org.apache.spark.sql.functions._
    val train = spark.range(500).select(col("id").as("doc_id"),
      concat(lit("text number "), col("id"), lit(" with some words")).as("text"))
    val evalSet = Seq("text number 7 with some words").toDF("text")
    val out = Contamination.overlapCounts(train, evalSet, n = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"eval side not broadcast — train corpus would shuffle:\n$plan")
  }
}
