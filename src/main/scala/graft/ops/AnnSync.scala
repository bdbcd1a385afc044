package graft.ops

import graft.tables.{ChangeFeedConsumer, VersionedTable}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared incremental-maintenance core behind [[IvfServing]] and
  * [[LshServing]]: any ANN family whose cell assignment is a FROZEN,
  * deterministic function of the vector (IVF centroid argmin, LSH
  * sign-bit bucket, …) can keep its cell-partitioned serving table in
  * step with a mutating source by consuming the source's change feed —
  * the cell of every changed vector (and of its pre-image) is
  * recomputable map-side, so no serving-table lookup is ever needed to
  * route a change.
  *
  * Per consumed range, at most TWO bucket-COW merges:
  *  1. tombstones into the OLD cells of keys that were deleted or whose
  *     new vector maps to a different cell (old cell = cellOf(earliest
  *     in-range pre-image), which IS the serving posting's cell because
  *     the quantizer is frozen);
  *  2. upserts of every surviving key's latest state into its NEW cell.
  * A key that changed without changing cell takes only merge 2 — its
  * cell is rewritten once, not twice.
  *
  * Exactly-once: the caller's position commits after the merges
  * (at-least-once replay), and each merge phase carries an idempotent
  * txn marker keyed on the range's upper version under the caller's
  * app id — replays are metadata no-ops; a crash BETWEEN the phases
  * replays into "skip 1, apply 2". App ids must be scoped by the
  * quantizer epoch so an explicit rebuild is not swallowed as a replay.
  */
private[ops] object AnnSync {

  private val EpochSidecar = "_quantizer_epoch"

  /** Quantizer epoch (0 until the first rebuild). Txn app ids embed it
    * so a rebuild's re-bootstrap is not swallowed as a replay. */
  def epochOf(spark: org.apache.spark.sql.SparkSession,
              root: String): Long =
    scala.util.Try(Sidecar.read(spark, root, EpochSidecar).toLong)
      .getOrElse(0L)

  def bumpEpoch(spark: org.apache.spark.sql.SparkSession,
                root: String): Unit =
    Sidecar.write(spark, root, EpochSidecar,
      (epochOf(spark, root) + 1L).toString)

  /** Rebuild reset: truncate the serving table (postings keyed by the
    * old quantizer are garbage) and wind the sync position back. Call
    * AFTER [[bumpEpoch]] (stale txn markers from the old epoch must
    * never match the re-bootstrap's replayed versions) and BEFORE the
    * new quantizer lands — a crash in between leaves an empty table +
    * old quantizer + reset position under a fresh app id, which the
    * next sync re-bootstraps consistently (just un-refitted). */
  def resetServing(spark: org.apache.spark.sql.SparkSession, root: String,
                   checkpointDir: String, cellCol: String): Unit = {
    val t = VersionedTable(spark, root)
    if (t.exists) t.overwrite(t.read.limit(0), partitionBy = Seq(cellCol))
    val pos = java.nio.file.Paths.get(checkpointDir, "position")
    java.nio.file.Files.deleteIfExists(pos)
    ()
  }

  /** Consume every unconsumed commit of `src` into the serving table at
    * `root`, assigning cells with `cellOf`. Returns the version range
    * applied, or None when caught up. */
  def syncInto(src: VersionedTable, root: String, checkpointDir: String,
               idCol: String, vecCol: String, cellCol: String,
               cellOf: Column => Column, appId: String,
               numBuckets: Int,
               autoCompactCellsOver: Option[Int] = None,
               storeExpr: Option[(Column => Column, String)] = None): Option[(Long, Long)] = {
    // what the serving table STORES per key: the raw vector by default,
    // or a projection of it (IVF-PQ stores m-byte codes — FAISS IVFADC's
    // memory shape). Cell ROUTING always computes from the raw vector,
    // so the projection never affects placement; tombstones carry the
    // projected pre-image (value unused, schema aligned).
    val (store, storeName) =
      storeExpr.getOrElse(((c: Column) => c, vecCol))
    val serving = VersionedTable(src.spark, root)
    val range = ChangeFeedConsumer.consumeAvailable(src, checkpointDir) { (changes, _, hi) =>
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
          .select(col(idCol), col(vecCol),
            cellOf(col(vecCol)).as("__old_cell"))
        // final state per key = the LATEST non-pre-image change (the
        // delete-below-insert version tie-break matters: a replace_where
        // commit deletes and re-inserts a key at ONE version, and the
        // posting must survive with the NEW vector, not vanish)
        val fin = Keyed.latestChangePerKey(
          classified.filter(col("__ct") =!= "update_preimage"),
          Seq(idCol), "__cv", "__ct")
        val finCelled = fin.select(col(idCol), col(vecCol), col("__ct"),
          cellOf(col(vecCol)).as(cellCol))
        // ONE tiny job decides which phases run (the alternative —
        // DataFrame.isEmpty per phase — re-materializes each phase's
        // window+join lineage just to peek at it): a bootstrap or
        // append-only batch has no pre-states and skips phase 1 with no
        // further look; a delete/update batch may still yield an empty
        // tombstone set (nothing moved cells), which then merges as an
        // empty batch — a cheap metadata-only commit, the rare case
        val ctCounts = classified.groupBy("__ct").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val hasPre = ctCounts.getOrElse("update_preimage", 0L) +
          ctCounts.getOrElse("delete", 0L) > 0
        val hasSurvivors =
          ctCounts.filterNot(_._1 == "update_preimage")
            .filterNot(_._1 == "delete").values.sum > 0
        // phase 1 — tombstones into OLD cells, only where the posting
        // must actually leave that cell
        if (hasPre) {
          val tombstones = pre.as("p")
            .join(finCelled.as("f"), Seq(idCol))
            .filter(col("f.__ct") === "delete" ||
              col("__old_cell") =!= col(cellCol))
            .select(col(idCol), store(col(s"p.$vecCol")).as(storeName),
              col("__old_cell").as(cellCol),
              lit(true).as(Merge.DeleteCol))
          serving.merge(tombstones, Seq(idCol), numBuckets = numBuckets,
            partitionBy = Seq(cellCol),
            txn = Some((appId + ":del", hi)))
          ()
        }
        // phase 2 — latest state of every surviving key into its cell
        if (hasSurvivors) {
          val upserts = finCelled.filter(col("__ct") =!= "delete")
            .select(col(idCol), store(col(vecCol)).as(storeName),
              col(cellCol))
          serving.merge(upserts, Seq(idCol), numBuckets = numBuckets,
            partitionBy = Seq(cellCol),
            txn = Some((appId + ":ups", hi)))
          ()
        }
      } finally { classified.unpersist(); () }
    }
    // per-cell small-file hygiene: insert-only syncs append one
    // file-set per touched cell without folding — after many syncs a
    // cell serves from many segments. Best-effort (the sync's data is
    // already durable and position-committed; a lost race or failure
    // must not fail the sync), metadata-only trigger, O(offending
    // partitions) when it fires.
    for (threshold <- autoCompactCellsOver; _ <- range)
      try { serving.compactCellsOver(threshold); () }
      catch {
        case _: java.util.ConcurrentModificationException => ()
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft] ann auto-compact at $root failed " +
            s"(sync is committed): $e")
      }
    range
  }

  /** Partition-pruned probe read + exact cosine re-rank. The probed
    * cell ids are grouped into CONTIGUOUS RUNS and each run becomes one
    * [[VersionedTable.readRange]] arm — a full-probe (every cell) or
    * full-radius multiprobe collapses to ONE scan instead of nCells
    * plan arms, while a sparse probe set stays per-cell-pruned. Numeric
    * range bounds are exact cell boundaries, and each arm's residual
    * filter keeps results exact either way. Ties cut on the 4-decimal
    * rounded similarity with id tiebreak (stable across engines). */
  def probeRank(serving: VersionedTable, cellCol: String,
                cells: Seq[Long], query: Seq[Float], k: Int,
                idCol: String, vecCol: String): DataFrame = {
    val pruned = prunedCells(serving, cellCol, cells)
    Similarity.bruteForceCosine(pruned, query, idCol, vecCol)
      .select(col(idCol), round(col("cosine_sim"), 4).as("sim4"))
      .orderBy(col("sim4").desc, col(idCol).asc)
      .limit(k)
  }

  /** The partition-pruned probe read alone (shared by the exact-re-rank
    * probe above and [[IvfPqServing]]'s ADC probe): probed cell ids
    * group into CONTIGUOUS RUNS, each one [[VersionedTable.readRange]]
    * arm — a full probe collapses to ONE scan, a sparse probe set stays
    * per-cell-pruned; residual filters keep each arm exact. */
  def prunedCells(serving: VersionedTable, cellCol: String,
                  cells: Seq[Long]): DataFrame = {
    val runs = cells.distinct.sorted
      .foldLeft(List.empty[(Long, Long)]) {
        case ((lo, hi) :: rest, c) if c == hi + 1 => (lo, c) :: rest
        case (acc, c)                             => (c, c) :: acc
      }.reverse
    runs
      .map { case (lo, hi) =>
        serving.readRange(cellCol, lo.toString, hi.toString) }
      .reduce(_ union _)
  }
}
