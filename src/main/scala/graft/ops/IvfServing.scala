package graft.ops

import graft.tables.{ChangeFeedConsumer, VersionedTable}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained IVF ANN serving table — the missing piece
  * between [[Similarity.writeIvfTable]] (build-once, rebuild-on-change)
  * and a production corpus that mutates: embeddings tables at 100 TB
  * take new/updated/deleted vectors continuously, and rebuilding a
  * whole inverted file per batch is O(corpus) where O(changed) is
  * available. Reference intent: the vector-serving half of the curation
  * stack (SURVEY §2's similarity-search north star) fed by the same
  * change-feed machinery as the CDC→MV maintenance flow.
  *
  * Layout: a [[VersionedTable]] merge-bucketed on the vector id and
  * hive-partitioned on `ivf_cell` — each file-set is one
  * (cell, key-bucket) posting segment, so a probe prunes to its cells
  * by file-set NAME (zero metadata reads) and a merge rewrites only the
  * touched cells. This is FAISS's IVF posting-list shape expressed as
  * table partitioning.
  *
  * Lifecycle:
  *  - [[build]] freezes a coarse quantizer (seeded sampled k-means, the
  *    FAISS IVF-Flat training step) into a `_centroids.csv` sidecar,
  *    then runs the first [[sync]] — which bootstraps from the source's
  *    CDF `-1` form (current snapshot as inserts) and so shares ONE
  *    code path with every later delta.
  *  - [[sync]] consumes the source's change feed since the checkpointed
  *    position and lands it in at most TWO bucket-COW merges, both
  *    O(changed vectors × touched cells):
  *      1. tombstones into the OLD cells of keys that were deleted or
  *         whose new embedding maps to a different cell (the old cell
  *         is recomputed from the change feed's pre-image through the
  *         frozen quantizer — deterministic, no serving-table lookup);
  *      2. upserts of every surviving key's latest state into its NEW
  *         cell.
  *    Cell ids come from the FROZEN centroids (map-only assignment
  *    against broadcast literals), so existing postings stay valid.
  *    A key that changed without changing cell takes only merge 2.
  *  - [[probeTopK]] ranks the centroid sidecar driver-side (tiny) and
  *    scans ONLY the nProbe nearest cells' file-sets (pruned by
  *    partition name), exact cosine re-rank on top: nProbe/nCells of
  *    the corpus per query.
  *
  * Exactly-once: the sync position commits AFTER the merges
  * (at-least-once replay on crash), and each merge carries an
  * idempotent txn marker keyed on the range's upper version — a
  * replayed range is a metadata no-op per merge, so a crash BETWEEN
  * the two merges replays into "skip 1, apply 2". The same discipline
  * as the streaming conformers.
  *
  * Centroid drift: the quantizer is frozen by design (rebalancing cells
  * would invalidate every posting). When the corpus drifts far enough
  * that cells skew, [[build]] with `overwriteCentroids = true` refits
  * and re-syncs from scratch — the explicit, observable rebuild, as in
  * FAISS index retraining.
  */
object IvfServing {

  val CellCol = "ivf_cell"
  private val CentroidsSidecar = "_centroids.csv"
  private val EpochSidecar = "_quantizer_epoch"
  private def syncDir(root: String) = root + "/_sync"

  /** Idempotent-txn app id, scoped by the quantizer EPOCH: a rebuild
    * ([[build]] with `overwriteCentroids`) truncates the serving table
    * and replays the same source versions — under the original app id
    * the bootstrap merge would be "already applied" and skip, leaving
    * the rebuilt table empty. Each refit bumps the epoch so its merges
    * are fresh transactions. */
  private def txnAppId(spark: SparkSession, root: String): String =
    s"ivf-sync:$root:e${epochOf(spark, root)}"

  private def epochOf(spark: SparkSession, root: String): Long =
    scala.util.Try(Sidecar.read(spark, root, EpochSidecar).toLong)
      .getOrElse(0L)

  /** Freeze the coarse quantizer from `src`'s CURRENT snapshot and run
    * the first [[sync]]. Refuses to re-fit an existing quantizer unless
    * `overwriteCentroids` (a refit invalidates the serving table: it is
    * truncated and re-synced from the CDF bootstrap). */
  def build(src: VersionedTable, root: String, nCells: Int,
            idCol: String = "vec_id", vecCol: String = "embedding",
            seed: Long = 42L, numBuckets: Int = 8,
            overwriteCentroids: Boolean = false): Option[(Long, Long)] = {
    val spark = src.spark
    require(src.changeFeedEnabled,
      s"IvfServing.build: enable the change feed on ${src.root} first " +
        "(sync consumes it to classify updates and deletes)")
    val hasCentroids =
      scala.util.Try(Sidecar.read(spark, root, CentroidsSidecar)).isSuccess
    require(!hasCentroids || overwriteCentroids,
      s"IvfServing.build: quantizer already frozen at $root " +
        "(pass overwriteCentroids=true to refit and rebuild)")
    if (hasCentroids) {
      // refit: postings keyed by the OLD cells are garbage — restart
      // the serving table and the sync position BEFORE the new fit
      // lands (a crash in between leaves an empty table + old
      // quantizer + reset position: the next sync re-bootstraps
      // consistently, just un-refitted)
      val t = VersionedTable(spark, root)
      if (t.exists) t.overwrite(t.read.limit(0), partitionBy = Seq(CellCol))
      val pos = java.nio.file.Paths.get(syncDir(root), "position")
      java.nio.file.Files.deleteIfExists(pos)
    }
    val idx = Similarity.ivfIndex(src.read, nCells, idCol, vecCol, seed)
    Sidecar.write(spark, root, CentroidsSidecar,
      idx.centroids.map(_.mkString(",")).mkString("\n"))
    if (hasCentroids)
      Sidecar.write(spark, root, EpochSidecar,
        (epochOf(spark, root) + 1L).toString)
    sync(src, root, idCol, vecCol, numBuckets)
  }

  /** Consume every unconsumed source commit into the serving table.
    * Returns the (fromExclusive, to] version range applied, or None
    * when already caught up. Call from a scheduler or after each
    * ingest batch — each call costs O(changed vectors). */
  def sync(src: VersionedTable, root: String,
           idCol: String = "vec_id", vecCol: String = "embedding",
           numBuckets: Int = 8): Option[(Long, Long)] = {
    val spark = src.spark
    val centroids = readCentroids(spark, root)
    def cellOf(vec: Column): Column =
      Similarity.nearestCellHof(vec.cast("array<double>"), centroids)
    val serving = VersionedTable(spark, root)
    val appId = txnAppId(spark, root)
    ChangeFeedConsumer.consumeAvailable(src, syncDir(root)) { (changes, _, hi) =>
      // the classified feed is read by both phases — materialize once
      // (O(changed); the bootstrap batch is the full snapshot, which an
      // index build reads once by necessity, spilling if large)
      val classified = changes.select(col(idCol),
          col(vecCol).cast("array<float>").as(vecCol),
          col("_change_type").as("__ct"),
          col("_commit_version").as("__cv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // pre-state per key = the EARLIEST in-range row describing a row
        // that existed when the range began (an update's pre-image or a
        // delete's payload); its cell is where the serving posting lives
        val pre = Keyed.firstPerKey(
            classified.filter(col("__ct").isin("update_preimage", "delete")),
            Seq(idCol), "__cv")
          .select(col(idCol), col(vecCol), cellOf(col(vecCol)).as("__old_cell"))
        // final state per key = the LATEST non-pre-image change
        val fin = Keyed.latestPerKey(
          classified.filter(col("__ct") =!= "update_preimage"),
          Seq(idCol), "__cv")
        val finCelled = fin.select(col(idCol), col(vecCol), col("__ct"),
          cellOf(col(vecCol)).as(CellCol))
        // phase 1 — tombstones into OLD cells, only where the posting
        // must actually leave that cell: the key was deleted, or its new
        // cell differs (a same-cell update is replaced by phase 2's
        // rewrite of that cell — tombstoning it too would rewrite the
        // cell twice for nothing)
        val tombstones = pre.as("p")
          .join(finCelled.as("f"), Seq(idCol))
          .filter(col("f.__ct") === "delete" ||
            col("__old_cell") =!= col(CellCol))
          .select(col(idCol), col(s"p.$vecCol").as(vecCol),
            col("__old_cell").as(CellCol),
            lit(true).as(Merge.DeleteCol))
        // phase 2 — latest state of every surviving key into its cell
        val upserts = finCelled.filter(col("__ct") =!= "delete")
          .select(col(idCol), col(vecCol), col(CellCol))
        if (!tombstones.isEmpty)
          serving.merge(tombstones, Seq(idCol), numBuckets = numBuckets,
            partitionBy = Seq(CellCol),
            txn = Some((appId + ":del", hi)))
        if (!upserts.isEmpty)
          serving.merge(upserts, Seq(idCol), numBuckets = numBuckets,
            partitionBy = Seq(CellCol),
            txn = Some((appId + ":ups", hi)))
        ()
      } finally { classified.unpersist(); () }
    }
  }

  /** Top-k cosine over the serving table: rank the frozen centroids
    * driver-side, scan ONLY the nProbe nearest cells' file-sets (pruned
    * by the partition value in the file-set name — no footer reads),
    * exact re-rank. Ties cut on the 4-decimal rounded similarity with
    * id tiebreak (stable across engines, as the other probe paths). */
  def probeTopK(spark: SparkSession, root: String, query: Seq[Float],
                k: Int, nProbe: Int, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val centroids = readCentroids(spark, root)
    val cells = Similarity.IvfIndex(centroids, null).probeCells(query, nProbe)
    val serving = VersionedTable(spark, root)
    // one partition-pruned arm per probed cell — nProbe tiny scans over
    // shared memoized log metadata
    val pruned = cells.map(c =>
        serving.readRange(CellCol, c.toString, c.toString))
      .reduce(_ union _)
    Similarity.bruteForceCosine(pruned, query, idCol, vecCol)
      .select(col(idCol), round(col("cosine_sim"), 4).as("sim4"))
      .orderBy(col("sim4").desc, col(idCol).asc)
      .limit(k)
  }

  private def readCentroids(spark: SparkSession,
                            root: String): Array[Array[Double]] =
    Sidecar.read(spark, root, CentroidsSidecar)
      .split("\n").map(_.split(",").map(_.toDouble))
}
