package graft

import org.apache.spark.sql.SparkSession

/** Plan audit (dev tool): print the formatted plan of named driver
  * queries — `runMain graft.ExplainQ <sfDir> <query> [query…]`. */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSeq match {
      case Nil => Seq("q_a1_pricing_summary")
      case qs  => qs
    }
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"===== $n")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
