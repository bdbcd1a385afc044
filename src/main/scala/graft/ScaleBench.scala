package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

import graft.tables.VersionedTable
import graft.ops.{IncrementalCuration, IvfServing}

/** Scale-stress artifact for the O(delta) claims: the incremental
  * operator families (change-feed curation, IVF serving sync,
  * bucket-COW keyed merge) each process a FIXED-size change slice
  * against corpora grown 1× → 3× → 10×, and publish per-changed-row
  * cost. The 100 TB argument for these paths is that per-batch work is
  * O(changed rows) — bloom-prefiltered state probes, cell-pruned
  * merges — so the measured slice time should stay roughly FLAT as the
  * corpus grows, not scale with it. Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.ScaleBench SCALE_BENCH.json"
  *
  * Factors run ascending in one JVM, so JIT warm-up (if anything)
  * biases AGAINST the flatness claim on the larger corpora. */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath = args.headOption.getOrElse("SCALE_BENCH.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // session warm-up

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val factors = Seq(1, 3, 10)
    val docsBase = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    val nDocs = docsBase.count()
    val nEmb = embBase.count()

    // ---------------------------------------- family 1: curation sync
    // Fixed slice: 1000 fresh distinct docs + 600 exact duplicates of
    // EXISTING corpus docs (suppressed against state, the probe-heavy
    // path) + 400 deletes of existing ids that own no duplicate class.
    val curation = factors.map { f =>
      val root = Files.createTempDirectory(s"graft-scale-cur$f-").toString
      val corpus = (0 until f).map(i => docsBase.select(
          (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" [replica $i]")).as("text")))
        .reduce(_.unionByName(_))
      val src = VersionedTable(spark, s"$root/docs")
      src.enableChangeFeed()
      src.append(corpus)
      val cfg = IncrementalCuration.Config(
        jaccardThreshold = 1.0, maxBucketSize = Int.MaxValue,
        numHashes = 16, bands = 4, numBuckets = 8)
      val (_, bootSec) = timed(IncrementalCuration.sync(src, s"$root/ws", cfg))
      src.append(
        docsBase.filter(col("doc_id") < 1000)
          .select((col("doc_id") + 900000000L).as("doc_id"),
            concat(col("text"), lit(" fresh delta marker")).as("text"))
        .unionByName(docsBase.filter(col("doc_id") < 600)
          .select((col("doc_id") + 950000000L).as("doc_id"),
            concat(col("text"), lit(" [replica 0]")).as("text"))))
      src.delete(col("doc_id") >= 1000 && col("doc_id") < 1400)
      val changed = 1600 + 400
      val (_, syncSec) = timed(IncrementalCuration.sync(src, s"$root/ws", cfg))
      VersionedTable.deleteRecursively(Paths.get(root))
      (f, nDocs * f, changed, bootSec, syncSec)
    }

    // ------------------------------------------- family 2: IVF sync
    // Fixed delta: 100 deletes + 100 deterministic re-embeds (cell
    // moves) + 200 fresh inserts against a 16-cell serving table.
    val ivf = factors.map { f =>
      val root = Files.createTempDirectory(s"graft-scale-ivf$f-").toString
      val corpus = (0 until f).map(i => embBase.select(
          (col("vec_id") + lit(i.toLong * 1000000L)).as("vec_id"),
          transform(col("embedding"),
            x => x + lit(i * 1e-4f)).as("embedding")))
        .reduce(_.unionByName(_))
      val src = VersionedTable(spark, s"$root/src")
      src.enableChangeFeed()
      src.append(corpus)
      val (_, buildSec) = timed(
        IvfServing.build(src, s"$root/serve", nCells = 16, numBuckets = 4,
          seed = 7L))
      src.delete(col("vec_id") < 100)
      src.update(Map("embedding" ->
        transform(col("embedding"), x => -x)),
        col("vec_id") >= 100 && col("vec_id") < 200)
      src.append(embBase.filter(col("vec_id") < 200)
        .select((col("vec_id") + 5000000L).as("vec_id"), col("embedding")))
      val changed = 100 + 100 + 200
      val (_, syncSec) = timed(
        IvfServing.sync(src, s"$root/serve", numBuckets = 4))
      VersionedTable.deleteRecursively(Paths.get(root))
      (f, nEmb * f, changed, buildSec, syncSec)
    }

    // ----------------------------- family 3: bucket-COW keyed merge
    // Fixed batch: 1000 updates of existing keys + 1000 fresh inserts
    // into a 32-bucket table — the touched-cell contract says cost
    // follows the batch's bucket coverage, not the table's row count.
    val merge = factors.map { f =>
      val root = Files.createTempDirectory(s"graft-scale-mrg$f-").toString
      val rows = 50000L * f
      val t = VersionedTable(spark, s"$root/t")
      t.merge(spark.range(rows).select(col("id").as("k"),
          (col("id") % 97).as("v")), Seq("k"), numBuckets = 32)
      val batch = spark.range(1000).select(col("id").as("k"),
          lit(-1L).as("v"))
        .unionByName(spark.range(1000).select(
          (col("id") + rows + 10L).as("k"), lit(-2L).as("v")))
      val (_, mergeSec) = timed(t.merge(batch, Seq("k"), numBuckets = 32))
      VersionedTable.deleteRecursively(Paths.get(root))
      (f, rows, 2000, 0.0, mergeSec)
    }

    // ------------------------- family 4: join-MV dim-delta maintenance
    // Fixed dim delta: 100 customer keys change segment against a fact
    // grown 1× → 3× → 10× (more customers, one fact row per key — the
    // keyed-fact star shape whose bucket-pruned read JoinMv.refresh
    // exploits). The telescoped dim slice reads ONLY the fact buckets
    // the changed keys hash to (≤100 of 256), so the measured cost per
    // changed dim row should stay flat while a full-scan fallback would
    // grow with the fact. The refresh mode is asserted incremental —
    // a silent degrade to recompute would fake a flat line at 1× and
    // blow up at 10×.
    val joinMv = factors.map { f =>
      val root = Files.createTempDirectory(s"graft-scale-jmv$f-").toString
      val nCust = 50000L * f
      val fact = VersionedTable(spark, s"$root/fact")
      val dim = VersionedTable(spark, s"$root/dim")
      val mv = VersionedTable(spark, s"$root/mv")
      fact.enableChangeFeed(); dim.enableChangeFeed()
      fact.merge(spark.range(nCust).select(col("id").as("ck"),
        (col("id") % 997L).as("p")), Seq("ck"), numBuckets = 256)
      dim.append(spark.range(nCust).select(col("id").as("ck"),
        concat(lit("seg"), (col("id") % 37L)).as("seg")))
      val (_, buildSec) = timed(graft.plans.JoinMv.create(fact,
        Seq(graft.plans.JoinMv.DimSide(dim, Seq(("ck", "ck")), None)),
        Seq("seg"), Seq(
          graft.plans.MvRewrite.AggSpec("sum", "p", "sum_p"),
          graft.plans.MvRewrite.AggSpec("count", "p", "cnt_p"),
          graft.plans.MvRewrite.AggSpec("count", "*", "cnt")), mv))
      val changed = 100
      dim.update(Map("seg" -> lit("segMOVED")),
        col("ck") % 500L === 7L && col("ck") < 500L * changed)
      val (mode, syncSec) = timed(graft.plans.JoinMv.refresh(spark, mv))
      require(mode.startsWith("cdf"),
        s"join-MV dim slice degraded to '$mode' at factor $f — the " +
          "measurement would not be exercising the incremental path")
      graft.plans.MvRewrite.deregister(mv)
      VersionedTable.deleteRecursively(Paths.get(root))
      (f, nCust, changed, buildSec, syncSec)
    }

    // --------------------- family 5: streaming apply-changes trigger
    // Fixed CDF slice (20 updates + 10 deletes + 20 inserts) through
    // the graft-table sink's APPLY CHANGES mode into a replica grown
    // 1× → 10×: the steady trigger's bucket-COW merge touches only the
    // slice's buckets (256-bucket layout via the sink's numBuckets
    // option), so per-changed-row cost must not grow with the replica —
    // this measures the WHOLE trigger path (source planning, retention
    // pin, lease, merge, checkpoint I/O), not just the merge.
    val sinkTrigger = factors.map { f =>
      val root = Files.createTempDirectory(s"graft-scale-snk$f-").toString
      val n = 50000L * f
      val src = VersionedTable(spark, s"$root/src")
      src.enableChangeFeed()
      src.append(spark.range(n).select(col("id").as("k"),
        (col("id") % 997L).as("v")))
      def sync(): Unit = {
        val q = spark.readStream.format("graft-table")
          .option("readChangeFeed", "true").load(s"$root/src")
          .writeStream.format("graft-table")
          .option("checkpointLocation", s"$root/cp")
          .option("mergeKeys", "k")
          .option("applyChanges", "true")
          .option("numBuckets", "256")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(s"$root/rep")
        q.awaitTermination()
      }
      val (_, bootSec) = timed(sync())
      src.update(Map("v" -> lit(-1L)), col("k") < 20L)
      src.delete(col("k") >= 100L && col("k") < 110L)
      src.append(spark.range(20).select((col("id") + n + 50L).as("k"),
        lit(-2L).as("v")))
      val changed = 50
      val (_, syncSec) = timed(sync())
      require(VersionedTable(spark, s"$root/rep").read.count() == n + 10,
        s"replica diverged at factor $f")
      VersionedTable.deleteRecursively(Paths.get(root))
      (f, n, changed, bootSec, syncSec)
    }

    // ------------------- family 6a: sketch-MV refresh vs base growth
    // Fixed append slice (2000 rows) absorbed into an HLL rollup MV as
    // the BASE table grows 1× → 10×. The refresh reads ONLY the added
    // sets (readAddedBetween) and merges a group-count-sized delta, so
    // cost per appended row must stay flat; the mode is asserted
    // "incremental" — a silent rebuild would grow with the base.
    val sketchMv = factors.map { f =>
      val root = Files.createTempDirectory(s"graft-scale-skm$f-").toString
      val n = 50000L * f
      val src = VersionedTable(spark, s"$root/src")
      val mv = VersionedTable(spark, s"$root/mv")
      src.enableChangeFeed()
      src.append(spark.range(n).select(
        concat(lit("g"), col("id") % 37L).as("flag"), col("id").as("okey")))
      val (_, buildSec) = timed(
        graft.ops.Sketches.create(src, mv, Seq("flag"), "okey"))
      src.append(spark.range(2000).select(
        concat(lit("g"), col("id") % 37L).as("flag"),
        (col("id") + n + 10L).as("okey")))
      val changed = 2000
      val (mode, syncSec) = timed(graft.ops.Sketches.refresh(spark, mv))
      require(mode == "incremental",
        s"sketch refresh degraded to '$mode' at factor $f")
      VersionedTable.deleteRecursively(Paths.get(root))
      (f, n, changed, buildSec, syncSec)
    }

    // ---------------- family 6b: streaming star-rollup trigger vs dims
    // Fixed fact CDF slice (50 updates) through the aggregate sink's
    // fact⋈dim star mode while the DIM grows 1× → 10×: the batch joins
    // the pinned dim snapshot, and the slice's cost must follow the
    // slice, not the dim — the batch side is broadcast against the
    // dim scan, and the merge touches only the slice's groups.
    val starStream = factors.map { f =>
      val root = Files.createTempDirectory(s"graft-scale-str$f-").toString
      val nDim = 50000L * f
      val fact = VersionedTable(spark, s"$root/fact")
      val dim = VersionedTable(spark, s"$root/dim")
      fact.enableChangeFeed()
      fact.append(spark.range(20000L).select(
        (col("id") % nDim).as("ck"), (col("id") % 997L).as("p")))
      dim.append(spark.range(nDim).select(col("id").as("ck"),
        concat(lit("s"), col("id") % 37L).as("seg")))
      def sync(): Unit = {
        val q = spark.readStream.format("graft-table")
          .option("readChangeFeed", "true").load(s"$root/fact")
          .writeStream.format("graft-table")
          .option("checkpointLocation", s"$root/cp")
          .option("mergeKeys", "seg")
          .option("aggregate", "sum:p:sum_p;count:*:cnt;count:p:cnt_p")
          .option("joinDims", s"$root/dim")
          .option("joinKeys", "ck=ck")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(s"$root/mv")
        q.awaitTermination()
      }
      val (_, bootSec) = timed(sync())
      fact.update(Map("p" -> (col("p") + 1L)), col("ck") < 50L)
      val changed = 50
      val (_, syncSec) = timed(sync())
      require(VersionedTable(spark, s"$root/mv").read.count() == 37L,
        s"star rollup diverged at factor $f")
      VersionedTable.deleteRecursively(Paths.get(root))
      (f, nDim, changed, bootSec, syncSec)
    }

    // ------------------ family 8: SCD2 all-sides-churn join-MV refresh
    // The q_sql_mv_scd2 shape reduced to its maintenance slice: an MV
    // over fact ⋈ current-version dim (SCD2 `is_current` filter), where
    // ONE refresh absorbs churn on BOTH sides — 100 customers
    // re-segmented (each closing its current version AND opening a new
    // one: a retract + an insert in the filtered dim's signed delta)
    // plus 100 fact-row updates — against a fact grown 1× → 10×. The
    // dim slice's fact read is bucket-pruned to the churned keys'
    // buckets and the fact slice is a signed CDF delta, so per-churned-
    // row cost must stay flat; the mode is asserted cdf* — a silent
    // recompute would fake flat at 1× and grow with the fact. This
    // family makes commit 0342be1's "maintenance cut" claim a
    // REGENERABLE measurement instead of a commit-message narrative.
    val scd2 = factors.map { f =>
      val root = Files.createTempDirectory(s"graft-scale-scd$f-").toString
      val nCust = 50000L * f // keyed fact: one row per customer, like family 4
      val fact = VersionedTable(spark, s"$root/fact")
      val dim = VersionedTable(spark, s"$root/dim")
      val mv = VersionedTable(spark, s"$root/mv")
      fact.enableChangeFeed(); dim.enableChangeFeed()
      fact.merge(spark.range(nCust).select(col("id").as("ck"),
        (col("id") % 997L).as("p")), Seq("ck"), numBuckets = 256)
      val cust = spark.range(nCust).select(col("id").as("ck"),
        concat(lit("seg"), col("id") % 37L).as("seg"))
      graft.ops.Scd2.applyBatchToTable(dim, cust, keys = Seq("ck"),
        tracked = Seq("seg"), batchTs = lit("2026-01-01 00:00:00"))
      val (_, buildSec) = timed(graft.plans.JoinMv.create(fact,
        Seq(graft.plans.JoinMv.DimSide(dim, Seq(("ck", "ck")),
          Some("is_current"))),
        Seq("seg"), Seq(
          graft.plans.MvRewrite.AggSpec("sum", "p", "sum_p"),
          graft.plans.MvRewrite.AggSpec("count", "p", "cnt_p"),
          graft.plans.MvRewrite.AggSpec("count", "*", "cnt")), mv))
      // all-sides churn in ONE refresh: 100 dims re-version (close +
      // reopen under the is_current filter) + 100 fact rows move value
      graft.ops.Scd2.applyBatchToTable(dim,
        cust.withColumn("seg", when(col("ck") < 100L,
          lit("PROMOTED")).otherwise(col("seg"))),
        keys = Seq("ck"), tracked = Seq("seg"),
        batchTs = lit("2026-02-01 00:00:00"))
      fact.update(Map("p" -> lit(-1L)),
        col("ck") >= 100L && col("ck") < 200L)
      val changed = 200
      val (mode, syncSec) = timed(graft.plans.JoinMv.refresh(spark, mv))
      require(mode.startsWith("cdf"),
        s"scd2 join-MV churn slice degraded to '$mode' at factor $f — " +
          "the measurement would not be exercising the incremental path")
      graft.plans.MvRewrite.deregister(mv)
      VersionedTable.deleteRecursively(Paths.get(root))
      (f, nCust, changed, buildSec, syncSec)
    }

    // -------------------------- skew A/B: hot-bucket merge batches
    // Same 500k-row 32-bucket table, same 4000-row update batch — once
    // spread uniformly across buckets, once with EVERY key hashing to
    // ONE bucket (keys filtered by the engine's own bucket expression,
    // pmod(hash(k), 32) == 0). The staged split REBALANCE fans the hot
    // bucket across tasks and the COW join processes one cell instead
    // of 32, so the two must land within ~2× — a hot batch serializing
    // in one task would show up as a multiple here.
    val skew = {
      val root = Files.createTempDirectory("graft-scale-skw-").toString
      val rows = 500000L
      def freshTable(tag: String): VersionedTable = {
        val t = VersionedTable(spark, s"$root/$tag")
        t.merge(spark.range(rows).select(col("id").as("k"),
          (col("id") % 97L).as("v")), Seq("k"), numBuckets = 32)
        t
      }
      val uniformKeys = spark.range(4000L).select(
        (col("id") * 125L).as("k"))                     // spread: all buckets
      val hotKeys = spark.range(rows)
        .filter(pmod(hash(col("id")), lit(32)) === 0)   // the engine's split
        .limit(4000).select(col("id").as("k"))
      Seq(("uniform", uniformKeys), ("hot", hotKeys)).map { case (tag, keys) =>
        val t = freshTable(tag)
        val batch = keys.withColumn("v", lit(-1L))
        val (_, sec) = timed(t.merge(batch, Seq("k"), numBuckets = 32))
        val nCells = t.history.last.fileSets.length
        (tag, sec, nCells)
      } match { case pts =>
        VersionedTable.deleteRecursively(Paths.get(root))
        pts
      }
    }

    def familyJson(points: Seq[(Int, Long, Int, Double, Double)],
                   prepName: String): String =
      points.map { case (f, corpus, changed, prep, sync) =>
        f"""{"factor":$f,"corpus_rows":$corpus,"changed_rows":$changed,""" +
          f""""${prepName}_sec":$prep%.2f,"sync_sec":$sync%.2f,""" +
          f""""ms_per_changed_row":${sync * 1000.0 / changed}%.3f}"""
      }.mkString("[", ",", "]")
    val json =
      s"""{"sf":"$sfDir","cpus":$cpus,"families":{""" +
        s""""curation_incremental":${familyJson(curation, "bootstrap")},""" +
        s""""ivf_sync":${familyJson(ivf, "build")},""" +
        s""""bucketed_merge":${familyJson(merge, "prep")},""" +
        s""""join_mv_dim_delta":${familyJson(joinMv, "build")},""" +
        s""""sink_trigger":${familyJson(sinkTrigger, "bootstrap")},""" +
        s""""sketch_mv_refresh":${familyJson(sketchMv, "build")},""" +
        s""""star_rollup_trigger":${familyJson(starStream, "bootstrap")},""" +
        s""""scd2_churn_refresh":${familyJson(scd2, "build")},""" +
        s""""skewed_merge":[""" + skew.map { case (tag, sec, cells) =>
          f"""{"dist":"$tag","merge_sec":$sec%.2f,"file_sets":$cells}"""
        }.mkString(",") +
        f"""],"skew_ratio":${skew(1)._2 / skew(0)._2}%.2f}}"""
    Files.writeString(Paths.get(outPath), json + "\n")
    println(json)
  }
}
