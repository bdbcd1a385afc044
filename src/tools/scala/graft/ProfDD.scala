package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiler for the MinHash near-dup path (dev tool; mirrors
  * the stages of [[graft.ops.Dedup.minhashNearDupPairs]]). */
object ProfDD {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numHashes = sys.env.getOrElse("PROF_HASHES", "128").toInt
    val bands = sys.env.getOrElse("PROF_BANDS", "16").toInt
    val r = numHashes / bands
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val res = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); res
    }
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val toks = split(col("text"), "\\s+")
    val corpus = d.unionByName(d.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - 2, lit(0)))).as("text")))
      .persist()
    time("corpus")(corpus.count())

    graft.functions.GraftFunctions.register(spark)
    val shingled = corpus.select(col("doc_id"),
      call_function("graft_shingle_hashes",
        graft.ops.TextAnalysis.tokens(col("text")), lit(3)).as("shingles"))
    time("shingles only")(shingled.select(sum(size(col("shingles")))).collect())

    val sigd = shingled
      .withColumn("sig", call_function("graft_minhash_hashes", col("shingles"), lit(numHashes)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time(s"sigd (shingles+$numHashes-hash sig, persist)")(sigd.count())

    val banded = sigd.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * lit(r) + 1, lit(r)))))
        .as(Seq("band_idx", "band_hash")))
    val candidates = graft.ops.Dedup.pairsWithinGroupsForProf(banded,
      Seq("band_idx", "band_hash"), "doc_id", 1000).persist()
    println("[prof] n_cand=" + time("candidates")(candidates.count()))

    val verified = candidates
      .join(sigd.select(col("doc_id").as("id_a"), col("shingles").as("shingles_a")), Seq("id_a"))
      .join(sigd.select(col("doc_id").as("id_b"), col("shingles").as("shingles_b")), Seq("id_b"))
      .select(
        (size(array_intersect(col("shingles_a"), col("shingles_b"))).cast("double") /
          size(array_union(col("shingles_a"), col("shingles_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.7)
    println("[prof] n_pairs=" + time("verify")(verified.count()))

    val t0 = System.nanoTime()
    val full = graft.ops.Dedup.minhashNearDupPairs(corpus,
      jaccardThreshold = 0.7, numHashes = numHashes, bands = bands)
    println("[prof] full n=" + full.count() +
      f" in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
