package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiler for the MinHash near-dup path (dev tool). */
object ProfDD {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val toks = split(col("text"), "\\s+")
    val corpus = d.unionByName(d.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat_ws(" ", slice(toks, lit(1), size(toks) - 2)).as("text")))
      .persist()
    time("corpus")(corpus.count())

    graft.functions.GraftFunctions.register(spark)
    val sigd = corpus
      .select(col("doc_id"),
        graft.ops.Dedup.wordShingles(col("text"), 3).as("shingles"))
      .withColumn("sig", call_function("graft_minhash", col("shingles"), lit(128)))
      .persist()
    time("sigd")(sigd.count())

    val banded = sigd.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(slice(col("sig"), b * lit(8) + 1, lit(8)))))
        .as(Seq("band_idx", "band_hash")))
    time("banded count")(banded.count())

    val buckets = banded.withColumn("bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("band_idx", "band_hash")))
      .filter(col("bucket_n") <= 1000).select("band_idx", "band_hash", "doc_id")
    val candidates = buckets.select(col("band_idx"), col("band_hash"),
        col("doc_id").as("doc_id_a"))
      .join(buckets.select(col("band_idx"), col("band_hash"),
        col("doc_id").as("doc_id_b")), Seq("band_idx", "band_hash"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select("doc_id_a", "doc_id_b").dropDuplicates("doc_id_a", "doc_id_b")
      .persist()
    println("[prof] n_cand=" + time("candidates (window+selfjoin)")(candidates.count()))

    // alternative: groupBy + in-array pair expansion
    val bucketed = banded.groupBy("band_idx", "band_hash")
      .agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")).between(2, 1000))
    val sorted = array_sort(col("ids"))
    val cand2 = bucketed.select(explode(flatten(
        transform(sorted, (x, i) =>
          transform(slice(sorted, i + lit(2), size(sorted)),
            y => struct(x.as("a"), y.as("b")))))).as("p"))
      .select(col("p.a").as("doc_id_a"), col("p.b").as("doc_id_b"))
      .dropDuplicates("doc_id_a", "doc_id_b")
      .persist()
    println("[prof] n_cand2=" + time("candidates (grouped pairs)")(cand2.count()))

    val verified = cand2
      .join(sigd.select(col("doc_id").as("doc_id_a"), col("shingles").as("shingles_a")), Seq("doc_id_a"))
      .join(sigd.select(col("doc_id").as("doc_id_b"), col("shingles").as("shingles_b")), Seq("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        (size(array_intersect(col("shingles_a"), col("shingles_b"))).cast("double") /
          size(array_union(col("shingles_a"), col("shingles_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.7)
    println("[prof] n_pairs=" + time("verify")(verified.count()))
    spark.stop()
  }
}
