package graft
import org.apache.spark.sql.SparkSession

/** Dev probe: q_dd3_simhash_pairs in isolation (bench showed 0.5s -> 44s
  * between BENCH refreshes; bisecting). */
object ProbeDd3 {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](n: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f
      println(f"[prof] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r }
    spark.read.parquet(s"$dir/documents.parquet").count()
    (1 to 3).foreach { i =>
      time(s"q_dd3 pass $i")(
        SparkEntry.queries("q_dd3_simhash_pairs")(spark, dir).count())
    }
    time("q_st1 pass 1")(
      SparkEntry.queries("q_st1_stream_ingest")(spark, dir).count())
    time("q_ml2 pass 1")(
      SparkEntry.queries("q_ml2_gbt_points")(spark, dir).count())
    spark.stop()
  }
}
