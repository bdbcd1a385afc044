package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish: value v appears ~ total/(v+1) times; unique row ids
  private def zipfRows(values: Int, total: Int) =
    (0 until values).flatMap(v => Seq.fill(total / (v + 1))(s"t$v"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("approxTopK finds every true heavy hitter with exact counts") {
    val df = zipfRows(200, 20000).toDF("row_id", "t")
    val got = TopK.approxTopK(df, col("row_id"), col("t"), k = 10)
      .as[(String, Long)].collect().toSeq
    val exact = df.groupBy("t").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t").asc).limit(10)
      .withColumnRenamed("t", "value")
      .as[(String, Long)].collect().toSeq
    assert(got === exact, "approx top-k diverged from exact top-k")
  }

  test("approxTopK is deterministic under repartitioning") {
    val df = zipfRows(100, 1000).toDF("row_id", "t")
    val a = TopK.approxTopK(df, col("row_id"), col("t"), k = 5)
      .as[(String, Long)].collect()
    val b = TopK.approxTopK(df.repartition(13), col("row_id"), col("t"), k = 5)
      .as[(String, Long)].collect()
    assert(a.toSeq === b.toSeq)
  }
}
