package graft

import org.apache.spark.sql.SparkSession

/** Result audit (dev tool): run named driver queries and print their
  * results — `runMain graft.RunQ <sfDir> <query> [query…]`. */
object RunQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSeq match {
      case Nil => Seq("q_a1_pricing_summary")
      case qs  => qs
    }
    val unknown = names.filterNot(SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}\n" +
        s"valid names:\n  ${SparkEntry.queries.keys.toSeq.sorted.mkString("\n  ")}")
      sys.exit(2)
    }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"===== $n")
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.show(50, truncate = false)
      println(f"[${(System.nanoTime() - t0) / 1e9}%.2fs]")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
