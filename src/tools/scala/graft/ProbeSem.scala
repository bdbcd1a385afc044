package graft
import org.apache.spark.sql.SparkSession
object ProbeSem {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val t0 = System.nanoTime()
      val r = SparkEntry.queries("q_dd5_semdedup")(spark, dir).collect()
      println(f"[sem] $dir -> ${r.mkString} in ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
