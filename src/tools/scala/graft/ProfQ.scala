package graft

import org.apache.spark.sql.SparkSession

/** Generic per-query stage profiler (dev tool): runs named SparkEntry
  * queries with a stage-grain listener printing task/cpu/gc/deser and
  * row counts — the ProfScd2 instrumentation for ANY query.
  * `runMain graft.ProfQ <sfDir> <query> [query…]`. */
object ProfQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq match {
      case Nil => Seq("q_sql_mv_topk")
      case qs  => qs
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var capture = false
    val total = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          if (capture) {
            val si = e.stageInfo
            val m = Option(si.taskMetrics)
            val task = m.map(_.executorRunTime).getOrElse(0L)
            total.addAndGet(task)
            if (task >= 100L) {
              val cpu = m.map(_.executorCpuTime / 1000000L).getOrElse(0L)
              val gc = m.map(_.jvmGCTime).getOrElse(0L)
              val deser = m.map(_.executorDeserializeTime).getOrElse(0L)
              val inR = m.map(_.inputMetrics.recordsRead).getOrElse(0L)
              val shR = m.map(_.shuffleReadMetrics.recordsRead).getOrElse(0L)
              System.err.println(f"  stage ${si.stageId}%4d tasks=${si.numTasks}%3d " +
                f"task=${task}%6dms cpu=${cpu}%6dms gc=${gc}%4dms " +
                f"deser=${deser}%5dms inRows=$inR%8d shRows=$shR%6d  " +
                si.name.take(55))
            }
          }
      })
    names.foreach { n =>
      System.err.println(s"===== $n")
      total.set(0L)
      capture = true
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val rows = df.collect().length
      val wall = (System.nanoTime() - t0) / 1e9
      capture = false
      Thread.sleep(400)
      System.err.println(f"===== $n rows=$rows wall=$wall%.2fs task=${total.get}ms")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
