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
  private def syncDir(root: String) = root + "/_sync"

  /** Idempotent-txn app id, scoped by the quantizer EPOCH: a rebuild
    * ([[build]] with `overwriteCentroids`) truncates the serving table
    * and replays the same source versions — under the original app id
    * the bootstrap merge would be "already applied" and skip, leaving
    * the rebuilt table empty. Each refit bumps the epoch so its merges
    * are fresh transactions. */
  private def txnAppId(spark: SparkSession, root: String): String =
    s"ivf-sync:$root:e${AnnSync.epochOf(spark, root)}"

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
      // epoch FIRST, then reset: a crash after the truncate but before
      // the bump would leave the OLD epoch's txn markers matching the
      // re-bootstrap's replayed versions — both merges would skip as
      // "already applied" and the table would stay silently empty.
      // Bumped-then-crashed instead leaves old postings + old quantizer
      // + intact position under a fresh app id: still consistent, and
      // the next build attempt just bumps again.
      AnnSync.bumpEpoch(spark, root)
      AnnSync.resetServing(spark, root, syncDir(root), CellCol)
    }
    val idx = Similarity.ivfIndex(src.read, nCells, idCol, vecCol, seed)
    Sidecar.write(spark, root, CentroidsSidecar,
      idx.centroids.map(_.mkString(",")).mkString("\n"))
    sync(src, root, idCol, vecCol, numBuckets)
  }

  /** Consume every unconsumed source commit into the serving table.
    * Returns the (fromExclusive, to] version range applied, or None
    * when already caught up. Call from a scheduler or after each
    * ingest batch — each call costs O(changed vectors). */
  def sync(src: VersionedTable, root: String,
           idCol: String = "vec_id", vecCol: String = "embedding",
           numBuckets: Int = 8,
           autoCompactCellsOver: Option[Int] = Some(8)): Option[(Long, Long)] = {
    val centroids = readCentroids(src.spark, root)
    AnnSync.syncInto(src, root, syncDir(root), idCol, vecCol, CellCol,
      vec => Similarity.nearestCellHof(vec.cast("array<double>"), centroids),
      txnAppId(src.spark, root), numBuckets, autoCompactCellsOver)
  }

  /** Top-k cosine over the serving table: rank the frozen centroids
    * driver-side, scan ONLY the nProbe nearest cells' file-sets (pruned
    * by the partition value in the file-set name — no footer reads),
    * exact re-rank with tie-stable output ([[AnnSync.probeRank]]). */
  def probeTopK(spark: SparkSession, root: String, query: Seq[Float],
                k: Int, nProbe: Int, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val centroids = readCentroids(spark, root)
    val cells = Similarity.IvfIndex(centroids, null).probeCells(query, nProbe)
    AnnSync.probeRank(VersionedTable(spark, root), CellCol,
      cells.map(_.toLong), query, k, idCol, vecCol)
  }

  private def readCentroids(spark: SparkSession,
                            root: String): Array[Array[Double]] =
    Sidecar.read(spark, root, CentroidsSidecar)
      .split("\n").map(_.split(",").map(_.toDouble))
}
