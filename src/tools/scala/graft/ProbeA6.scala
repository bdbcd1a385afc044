package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeA6 {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](n: String)(f: => T): T = { val t0=System.nanoTime(); val r=f
      println(f"[prof] $n: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    time("warm read")(orders.count())
    val w = graft.ops.WindowOps.rollingMean(orders, "o_custkey", "o_orderdate", "o_totalprice", 3, "o_orderkey")
      .select(col("o_orderkey"), round(col("rolling_mean_3"),4).as("form_3"), col("window_rows"))
    time("window only")(w.count())
    time("window+orderBy")(w.orderBy("o_orderkey").count())
    time("window+orderBy again")(w.orderBy("o_orderkey").count())
    val d = graft.ops.WindowOps.snapshotDeltas(orders, "o_custkey", "o_orderdate", "o_totalprice", "o_orderkey")
    time("w2 deltas+orderBy")(d.orderBy("o_custkey","o_orderkey").count())
    spark.stop()
  }
}
