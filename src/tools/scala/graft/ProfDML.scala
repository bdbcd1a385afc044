package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step-level profiler for the VersionedTable DML-chain queries
  * (q_m12_change_feed shape): times each commit and counts Spark jobs per
  * step (dev tool). */
object ProfDML {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    @volatile var jobs = 0
    val described = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs += 1
          described.add(s.stageInfos.map(si =>
            s"${si.name.takeWhile(_ != '\n').take(60)}(${si.numTasks}t)")
            .mkString(" | "))
        }
      })
    def time[T](name: String)(f: => T): T = {
      Thread.sleep(100) // let listener drain
      described.clear()
      val j0 = jobs; val t0 = System.nanoTime(); val res = f
      Thread.sleep(100)
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        s"${jobs - j0} jobs")
      described.forEach(d => println(s"[prof]    job: $d"))
      res
    }

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass")
      val root = java.nio.file.Files
        .createTempDirectory("graft-profdml-").toString
      val tbl = graft.tables.VersionedTable(spark, root)
      tbl.enableChangeFeed()
      val n = spark.read.parquet(s"$dir/nation.parquet")
        .select("n_nationkey", "n_name", "n_regionkey")
      time("append v0")(tbl.append(n.filter(col("n_regionkey") <= 1)))
      time("merge v1")(tbl.merge(n.filter(col("n_regionkey").isin(1, 2))
          .withColumn("n_name", concat(col("n_name"), lit("_u"))),
        keys = Seq("n_nationkey")))
      time("update v2")(tbl.update(
        Map("n_name" -> concat(col("n_name"), lit("!"))),
        col("n_nationkey") < 5))
      time("deleteRange v3")(tbl.deleteRange("n_nationkey", "10", "14"))
      time("readChangeFeed")(tbl.readChangeFeed(-1)
        .select(col("_commit_version").as("v"),
          col("_change_type").as("ct"),
          col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy("v", "ct", "n_nationkey").count())
    }
    spark.stop()
  }
}
