package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle + contiguous-range sharding — the final
  * step of a pretraining data pipeline (shuffle the corpus, cut it into
  * N equal shards, write each shard in its shuffled order for the
  * dataloader).
  *
  * The shuffle order is `md5(seed:id)` — engine-portable and
  * reshard-stable like every sampling decision in [[Sampling]]: the
  * same (seed, corpus) yields the same order on any engine, any
  * partitioning, any rerun (DuckDB replays it verbatim, which is what
  * the oracle does). Ties (md5 collisions — guaranteed at 10^11 docs
  * against a 60-bit bucket prefix) break on the id itself, so the total
  * order is always well-defined.
  *
  * The global rank is the textbook two-phase scan, NOT a global-sort
  * window: range-bucket on the numeric key prefix (driver-side quantile
  * cuts, one pass), rank within buckets in parallel windows, roll the
  * per-bucket counts into offsets driver-side (`numBuckets` longs).
  * No single task ever sees more than ~1/numBuckets of the corpus — a
  * bare `row_number().over(Window.orderBy(key))` would collapse 100 TB
  * into ONE task.
  *
  * Shards are contiguous rank ranges (`shard s = ranks [ceil(sT/N),
  * ceil((s+1)T/N))`), so shard sizes differ by at most one document and
  * a shard is exactly a slice of the shuffled corpus — the layout
  * dataloaders expect.
  */
object Sharding {

  /** The deterministic shuffle key: lowercase md5 hex of `seed:id`. */
  def shuffleKey(seed: String, id: Column): Column =
    md5(concat_ws(":", lit(seed), id.cast("string")))

  /** `docs` plus `shuffle_key`, `shard` (0-based) and `shard_pos`
    * (0-based position within the shard, in shuffled order).
    * `idCol` values must be distinct (they are the tiebreak). */
  def assignShards(docs: DataFrame, idCol: String, seed: String,
                   numShards: Int, numBuckets: Int = 32): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val keyed = docs
      .withColumn("shuffle_key", shuffleKey(seed, col(idCol)))
      // 60-bit numeric prefix: uniform, and numeric order is consistent
      // with the full key's lexicographic order (fixed-length lowercase
      // hex), so bucketing on it agrees with the (key, id) total order
      .withColumn("__skn",
        conv(substring(col("shuffle_key"), 1, 15), 16, 10).cast("long"))
    // the two metadata passes (quantile cuts, bucket counts) run over a
    // persisted KEY-ONLY projection — document payloads are read once in
    // the final plan, not re-scanned and re-hashed per pass
    val slim = keyed.select("__skn")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (cuts, counts) = try {
      val nCuts = math.max(1, numBuckets - 1)
      val cs = slim.stat
        .approxQuantile("__skn",
          (1 to nCuts).map(_.toDouble / numBuckets).toArray, 0.001)
        .distinct.sorted
      def bucketOf(c: Column): Column = cs.foldLeft(lit(0)) { (acc, cut) =>
        acc + when(c > cut, 1).otherwise(0)
      }
      // per-bucket counts -> exclusive running offsets: numBuckets longs
      // to the driver, metadata-sized at any corpus size
      val cn = slim.groupBy(bucketOf(col("__skn")).as("__psb"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      (cs, cn)
    } finally { slim.unpersist(); () }
    val bucket: Column = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col("__skn") > c, 1).otherwise(0)
    }
    val bucketed = keyed.withColumn("__psb", bucket)
    val total = counts.values.sum
    if (total == 0) {
      return bucketed.drop("__skn", "__psb")
        .withColumn("shard", lit(0)).withColumn("shard_pos", lit(0L))
        .limit(0)
    }
    val offsets = {
      var acc = 0L
      counts.keys.toSeq.sorted.map { b =>
        val o = (b, acc); acc += counts(b); o
      }.toMap
    }
    val inBucket = row_number()
      .over(Window.partitionBy("__psb").orderBy("shuffle_key", idCol))
    // 0-based global rank. Shard arithmetic runs in INTEGER division
    // (SQL `div`), exact for every rank a Long can hold — double `/`
    // would go inexact past rank*numShards = 2^53 and silently round
    // boundary ranks into the neighboring shard. The remaining bound is
    // Long overflow of rank*numShards (~10^15 docs at 8192 shards),
    // orders of magnitude past any real corpus.
    val rank = element_at(typedlit(offsets), col("__psb")) +
      inBucket.cast("long") - 1L
    bucketed
      .withColumn("__rank", rank)
      .withColumn("shard",
        expr(s"(__rank * ${numShards}L) div ${total}L").cast("int"))
      // shard start = ceil(shard * total / numShards), in integer math
      .withColumn("shard_pos", (col("__rank") - expr(
        s"(shard * ${total}L + ${numShards - 1}L) div ${numShards}L"))
        .cast("long"))
      .drop("__skn", "__psb", "__rank")
  }

  /** Materialize the shuffled, sharded corpus: hive-partitioned by
    * `shard`, each shard's files sorted by `shard_pos` (so a dataloader
    * reading a shard's files in order sees the shuffled order). One
    * range shuffle + one write — the canonical big sort, sized by
    * `numShards` output partitions. */
  def writeShards(docs: DataFrame, idCol: String, seed: String,
                  numShards: Int, path: String,
                  numBuckets: Int = 32): Unit =
    assignShards(docs, idCol, seed, numShards, numBuckets)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions("shard", "shard_pos")
      .write.partitionBy("shard").mode("overwrite").parquet(path)
}
