package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Per-job profile of the SCD2 join-MV maintenance slice (dev tool):
  * replays q_sql_mv_scd2's shape and prints, FOR THE REFRESH ONLY,
  * every Spark job's wall duration, summed task time, and call site —
  * where the all-sides-churn dim slice actually spends its cost.
  * `runMain graft.ProfScd2 [sfDir]`. */
object ProfScd2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // job-grain accounting: description + wall + summed task time
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val taskMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    @volatile var capture = false
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (capture) {
          val desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(e.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          jobs.put(e.jobId, (desc, e.time))
          e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
          taskMs.put(e.jobId, new java.util.concurrent.atomic.AtomicLong)
        }
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val j = stageToJob.get(e.stageId)
        val acc = taskMs.get(j)
        if (acc != null && e.taskMetrics != null)
          acc.addAndGet(e.taskMetrics.executorRunTime)
        ()
      }
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (capture) {
          val si = e.stageInfo
          val m = Option(si.taskMetrics)
          val task = m.map(_.executorRunTime).getOrElse(0L)
          val cpu = m.map(_.executorCpuTime / 1000000L).getOrElse(0L)
          val gc = m.map(_.jvmGCTime).getOrElse(0L)
          val deser = m.map(_.executorDeserializeTime).getOrElse(0L)
          val inRows = m.map(_.inputMetrics.recordsRead).getOrElse(0L)
          val shRows = m.map(_.shuffleReadMetrics.recordsRead).getOrElse(0L)
          System.err.println(f"  stage ${si.stageId}%3d tasks=${si.numTasks}%3d " +
            f"task=${task}%6dms cpu=${cpu}%6dms gc=${gc}%4dms deser=${deser}%5dms " +
            f"inRows=$inRows%7d shRows=$shRows%5d  ${si.name.take(60)}")
        }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val st = jobs.remove(e.jobId)
        if (st != null)
          done.add((e.jobId, st._1, e.time - st._2, taskMs.get(e.jobId).get))
        ()
      }
    })

    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (capture) {
          val head = qe.sparkPlan.toString.linesIterator
            .find(_.trim.nonEmpty).getOrElse("?").take(110)
          System.err.println(f"  [exec] $funcName%-10s ${durationNs / 1e6}%7.0fms  $head")
          if (funcName == "command" && sys.env.contains("GRAFT_PROF_PLANS"))
            System.err.println(qe.executedPlan.toString.linesIterator
              .take(40).map("      " + _).mkString("\n"))
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          error: Exception): Unit = ()
    })

    def phase[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val before = { Thread.sleep(200); done.size }
      val r = f
      Thread.sleep(300)
      var task = 0L; var n = 0
      val it = done.iterator(); var i = 0
      while (it.hasNext) { val e = it.next(); if (i >= before) { task += e._4; n += 1 }; i += 1 }
      System.err.println(f"[phase] $label%-22s wall=${(System.nanoTime() - t0) / 1e9}%5.2fs task=${task}ms jobs=$n")
      r
    }
    if (sys.env.contains("GRAFT_PROF_ALL")) capture = true

    val wh = Files.createTempDirectory("graft-profscd2-").toString
    val cat = new graft.tables.Catalog(spark, wh)
    cat.bootstrap()
    val fact = cat.table("silver", "fct")
    val dim = cat.table("silver", "cust")
    fact.enableChangeFeed(); dim.enableChangeFeed()
    phase("fact append")(fact.append(
      spark.read.parquet(s"$sfDir/orders.parquet").select(
        col("o_custkey").as("ck"),
        floor(col("o_totalprice")).cast("long").as("p"))))
    val cust = spark.read.parquet(s"$sfDir/customer.parquet").select(
      col("c_custkey").as("ck"), col("c_mktsegment").as("seg"))
    phase("scd2 batch 1")(graft.ops.Scd2.applyBatchToTable(dim, cust,
      keys = Seq("ck"), tracked = Seq("seg"),
      batchTs = lit("2026-01-01 00:00:00")))
    val gsql = graft.tables.GraftSql(spark, cat)
    graft.plans.MvRewrite.install(spark)
    try {
      phase("create mv")(gsql.sql("CREATE MATERIALIZED VIEW gold.mv_cur AS SELECT seg, " +
        "sum(p) AS sum_p, count(p) AS cnt_p, count(*) AS cnt " +
        "FROM silver.fct JOIN silver.cust USING (ck) " +
        "WHERE cust.is_current GROUP BY seg"))
      phase("scd2 batch 2")(graft.ops.Scd2.applyBatchToTable(dim,
        cust.withColumn("seg",
          when(col("ck") % 10 === 0, lit("PROMOTED")).otherwise(col("seg"))),
        keys = Seq("ck"), tracked = Seq("seg"),
        batchTs = lit("2026-02-01 00:00:00")))
      System.err.println("===== REFRESH start")
      capture = true
      val t0 = System.nanoTime()
      val mode = gsql.sql("REFRESH MATERIALIZED VIEW gold.mv_cur")
        .select("mode").head().getString(0)
      val wall = (System.nanoTime() - t0) / 1e9
      capture = false
      Thread.sleep(500) // drain listener bus
      System.err.println(f"===== REFRESH mode=$mode wall=$wall%.2fs")
      var totalTask = 0L
      done.forEach { case (id, desc, wallMs, task) =>
        totalTask += task
        System.err.println(f"job $id%3d  wall=${wallMs}%5dms task=${task}%6dms  $desc")
      }
      System.err.println(f"===== summed task=${totalTask}ms across ${done.size} jobs")
    } finally graft.plans.MvRewrite.deregister(cat.table("gold", "mv_cur"))
    spark.stop()
  }
}
