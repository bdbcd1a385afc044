package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

import graft.tables.VersionedTable

/** Per-trigger phase profile of the APPLY CHANGES replica sink (dev
  * tool): replays q_st10_apply_changes' shape and prints every
  * micro-batch's durationMs decomposition from the streaming listener —
  * where a steady-state trigger actually spends its time. */
object ProfSt10 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          System.err.println(s"[batch ${p.batchId}] rows=${p.numInputRows} " +
            s"durations=${p.durationMs}")
        }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })
    val tmp = Files.createTempDirectory("graft-profst10-").toString
    val src = VersionedTable(spark, s"$tmp/src")
    val nat = spark.read.parquet(s"$sfDir/nation.parquet")
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_name"), col("n_regionkey").cast("long").as("n_regionkey"))
    src.enableChangeFeed()
    src.append(nat)
    src.merge(nat.filter(col("n_regionkey") === 1)
      .withColumn("n_name", upper(col("n_name"))), Seq("n_nationkey"))
    src.delete(col("n_regionkey") === 2)
    def sync(label: String): Unit = {
      System.err.println(s"===== sync: $label")
      val t0 = System.nanoTime()
      val q = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(s"$tmp/src")
        .writeStream.format("graft-table")
        .option("checkpointLocation", s"$tmp/cp")
        .option("mergeKeys", "n_nationkey")
        .option("applyChanges", "true")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(s"$tmp/replica")
      q.awaitTermination()
      System.err.println(f"===== $label wall ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    sync("round 1 (bootstrap)")
    src.merge(nat.filter(col("n_regionkey") === 3)
      .withColumn("n_name", upper(col("n_name"))), Seq("n_nationkey"))
    src.delete(col("n_regionkey") === 4)
    sync("round 2 (steady)")
    // steady-state repetition: 5 more single-commit rounds
    (0 until 5).foreach { i =>
      src.merge(nat.filter(col("n_regionkey") === (i % 5))
        .withColumn("n_name", concat(col("n_name"), lit(s"_$i"))),
        Seq("n_nationkey"))
      sync(s"steady $i")
    }
    spark.stop()
  }
}
