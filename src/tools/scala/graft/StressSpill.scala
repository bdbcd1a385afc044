package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import graft.tables.VersionedTable

/** Constrained-memory spill stress (dev tool): runs the three heaviest
  * operator shapes — bucket-COW merge, MinHash banded near-dup, IVF
  * build — over AMPLIFIED sf0.1 inputs and prints one JSON line with a
  * content checksum and the spill bytes per shape. Launched twice by
  * the harness (see SCALE.md "Spill behavior under constrained
  * memory"): once roomy, once via spark-submit with a small driver
  * heap and force-spill thresholds. Equal checksums + nonzero spill +
  * no OOM in the constrained run prove the paths SPILL instead of
  * dying when executor memory is short — the situation a 100 TB
  * deployment's executors actually face.
  *
  * Checksums are order-independent XORs of per-row hashes, so task
  * layout, spilling, and AQE decisions cannot move them; the IVF
  * k-means trains on the FULL collected corpus (bounded here) so the
  * centroids cannot drift with sampling layout either. */
object StressSpill {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val amp = sys.env.getOrElse("GRAFT_SPILL_AMP", "8").toInt
    val spark = SparkSession.builder() // master + memory from the launcher
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SPILL_PARTS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val spilledDisk = new AtomicLong
    val spilledMem = new AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (e.taskMetrics != null) {
            spilledDisk.addAndGet(e.taskMetrics.diskBytesSpilled)
            spilledMem.addAndGet(e.taskMetrics.memoryBytesSpilled)
          }
          ()
        }
      })

    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    def shape(label: String)(f: => Long): Unit = {
      spilledDisk.set(0L); spilledMem.set(0L)
      val t0 = System.nanoTime()
      val checksum = f
      val sec = (System.nanoTime() - t0) / 1e9
      out(label) = f"""{"sec":$sec%.1f,"checksum":$checksum,""" +
        s""""spill_disk_mb":${spilledDisk.get / 1048576L},""" +
        s""""spill_mem_mb":${spilledMem.get / 1048576L}}"""
    }

    val tmp = sys.env.get("GRAFT_SPILL_DIR").map { d =>
      Files.createDirectories(java.nio.file.Paths.get(d)); d
    }.getOrElse(Files.createTempDirectory("graft-spill-").toString)

    // 1. bucket-COW merge: amplified orders (amp × 4 × 150k rows).
    //    o_orderkey is UNIQUE, so the derived keys are collision-free —
    //    colliding source keys would hit the plain upsert's DOCUMENTED
    //    arbitrary dedup (dropDuplicates; "dedup the source or pass
    //    preferUpdateBy") whose pick legitimately moves under spill's
    //    sort-fallback ordering, and the checksum would chase that
    //    nondeterminism instead of the spill path. (Found the hard way:
    //    the sf0.1 lineitem fixture has duplicate (orderkey, linenumber)
    //    pairs.)
    shape("cow_merge") {
      val reps = amp * 4L
      def src = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"),
          floor(col("o_totalprice")).cast("long").as("qty"),
          col("o_custkey").cast("long").as("price"))
        .withColumn("__rep", explode(sequence(lit(0L), lit(reps - 1L))))
        .select((col("o_orderkey") * reps + col("__rep")).as("k"),
          col("qty"), col("price"))
      val t = VersionedTable(spark, s"$tmp/cow")
      t.merge(src, Seq("k"), numBuckets = 16)
      t.merge(src.filter(col("k") % 5 === 0)
        .withColumn("qty", col("qty") + 1), Seq("k"), numBuckets = 16)
      // bit_xor: order-independent and overflow-free (an ANSI sum of
      // millions of xxhash64 values overflows long)
      // bit_xor: order-independent and overflow-free (an ANSI sum of
      // millions of xxhash64 values overflows long)
      t.read.agg(bit_xor(xxhash64(col("k"), col("qty"), col("price"))) +
        count(lit(1))).head().getLong(0)
    }

    // 2. MinHash banded near-dup over amplified documents — the
    //    shingle/signature explode + band-bucket shuffle path
    shape("minhash_pairs") {
      val reps = math.max(1, amp / 4)
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .withColumn("__rep", explode(sequence(lit(0), lit(reps - 1))))
        .select((col("doc_id") * 100 + col("__rep")).as("doc_id"),
          // replicas of one doc are exact near-dups of each other:
          // the pair volume scales with reps² per original doc
          col("text"))
      val pairs = graft.ops.Dedup.minhashNearDupPairs(docs)
      pairs.agg(coalesce(bit_xor(xxhash64(col("doc_id_a"),
        col("doc_id_b"))), lit(0L)) + count(lit(1))).head().getLong(0)
    }

    // 3. IVF build over amplified embeddings — bounded k-means train +
    //    map-only assignment (structurally spill-free; asserted to
    //    COMPLETE under the same constrained heap)
    shape("ivf_build") {
      val reps = math.max(1, amp / 2)
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id").cast("long").as("vec_id"),
          col("embedding"))
        .withColumn("__rep", explode(sequence(lit(0), lit(reps - 1))))
        .select((col("vec_id") * 100 + col("__rep")).as("vec_id"),
          col("embedding"))
      val idx = graft.ops.Similarity.ivfIndex(emb, nCells = 32,
        trainSampleSize = Int.MaxValue) // full train: no sample-order drift
      idx.assigned.agg(bit_xor(xxhash64(col("vec_id"), col("ivf_cell"))))
        .head().getLong(0)
    }

    val heapMb = Runtime.getRuntime.maxMemory() / 1048576L
    println(s"""{"heap_mb":$heapMb,"amp":$amp,""" +
      out.map { case (k, v) => s""""$k":$v""" }.mkString(",") + "}")
    spark.stop()
  }
}
