package graft.ops

import graft.tables.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ composed serving table — [[IvfServing]]'s cell-partitioned
  * incremental maintenance with [[Similarity.PqCodebook]] codes stored
  * instead of raw vectors: FAISS IVFADC's memory shape (Jégou et al.
  * 2011), the one real 100 TB ANN serving uses. A billion-vector corpus
  * serves from m bytes/row instead of 4·d; cells prune the read, the
  * broadcast ADC tables score codes map-side, and the frozen coarse
  * quantizer + frozen codebook make every maintenance step a map-only
  * assignment — [[AnnSync]]'s two-merge O(changed vectors) sync applies
  * unchanged, with an encode projection on the stored value.
  *
  * Both quantizers freeze at [[build]]: the coarse centroids route
  * cells (routing ALWAYS computes from the raw change-feed vector, so
  * storage compression never affects placement) and the PQ codebook
  * encodes payloads. Refitting either invalidates the table —
  * [[build]] with `overwriteCentroids = true` is the explicit rebuild,
  * epoch-bumped exactly like the flat-vector flavors.
  *
  * Scores are APPROXIMATE by design (ADC against quantized codes) —
  * the trade the format exists to make. On a corpus whose per-subspace
  * distinct patterns fit the codebook, quantization is lossless and the
  * full probe reproduces exact inner products (the oracle witness
  * `q_sim_ivfpq_lossless` hash-checks exactly that, mutation tail
  * included).
  */
object IvfPqServing {

  val CellCol = "ivf_cell"
  private val CentroidsSidecar = "_centroids.csv"
  private val CodebookSidecar = "_pq_codebook.csv"
  private val ResidualSidecar = "_pq_residual"
  private def syncDir(root: String) = root + "/_sync"

  private def txnAppId(spark: SparkSession, root: String): String =
    s"ivfpq-sync:$root:e${AnnSync.epochOf(spark, root)}"

  /** Freeze the coarse quantizer AND the PQ codebook from `src`'s
    * CURRENT snapshot, then run the first [[sync]] (CDF bootstrap — one
    * code path with every later delta). For cosine-faithful ADC scores,
    * L2-normalize the source vectors upstream.
    *
    * `residual = true` is FAISS IVFADC proper: the codebook trains on
    * and encodes `vec − centroid[cell]` instead of the raw vector —
    * residuals are smaller and more isotropic, so the same m-byte code
    * budget carries more precision — and the probe adds the per-cell
    * `query·centroid` constant back (for inner-product scoring the ADC
    * tables stay cell-independent: q·v = q·c + q·r̃). */
  def build(src: VersionedTable, root: String, nCells: Int, m: Int,
            k: Int = 16, idCol: String = "vec_id",
            vecCol: String = "embedding", seed: Long = 42L,
            numBuckets: Int = 8, residual: Boolean = false,
            overwriteCentroids: Boolean = false): Option[(Long, Long)] = {
    val spark = src.spark
    require(src.changeFeedEnabled,
      s"IvfPqServing.build: enable the change feed on ${src.root} first " +
        "(sync consumes it to classify updates and deletes)")
    val hasQuantizer =
      scala.util.Try(Sidecar.read(spark, root, CentroidsSidecar)).isSuccess
    require(!hasQuantizer || overwriteCentroids,
      s"IvfPqServing.build: quantizers already frozen at $root " +
        "(pass overwriteCentroids=true to refit and rebuild)")
    if (hasQuantizer) {
      // epoch FIRST, then reset — see IvfServing.build's crash argument
      AnnSync.bumpEpoch(spark, root)
      AnnSync.resetServing(spark, root, syncDir(root), CellCol)
    }
    val idx = Similarity.ivfIndex(src.read, nCells, idCol, vecCol, seed)
    val trainFrame =
      if (!residual) src.read
      else src.read.select(
        Similarity.residualExpr(org.apache.spark.sql.functions.col(vecCol),
          idx.centroids).as(vecCol))
    val cb = Similarity.pqTrain(trainFrame, m, k, vecCol, seed)
    // BOTH trainings succeeded before any sidecar lands, and the
    // centroids sidecar — the `hasQuantizer` probe — lands LAST: a
    // training failure (dim % m != 0, empty corpus) or a crash between
    // writes leaves a root a corrective re-run of build() can still
    // claim without overwriteCentroids, never a poisoned half-quantizer
    Sidecar.write(spark, root, CodebookSidecar,
      Similarity.pqCodebookToText(cb))
    Sidecar.write(spark, root, ResidualSidecar, if (residual) "1" else "0")
    Sidecar.write(spark, root, CentroidsSidecar,
      idx.centroids.map(_.mkString(",")).mkString("\n"))
    sync(src, root, idCol, vecCol, numBuckets)
  }

  /** Consume every unconsumed source commit: the same ≤2 bucket-COW
    * merges as [[IvfServing.sync]], storing `codes` (the frozen
    * codebook's encoding) instead of the raw vector. */
  def sync(src: VersionedTable, root: String,
           idCol: String = "vec_id", vecCol: String = "embedding",
           numBuckets: Int = 8,
           autoCompactCellsOver: Option[Int] = Some(8)): Option[(Long, Long)] = {
    val spark = src.spark
    val centroids = readCentroids(spark, root)
    val cb = readCodebook(spark, root)
    val resid = isResidual(spark, root)
    val encode: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      v => Similarity.pqCodesExpr(
        if (resid) Similarity.residualExpr(v, centroids) else v, cb)
    AnnSync.syncInto(src, root, syncDir(root), idCol, vecCol, CellCol,
      vec => Similarity.nearestCellHof(vec.cast("array<double>"), centroids),
      txnAppId(spark, root), numBuckets, autoCompactCellsOver,
      storeExpr = Some((encode, "codes")))
  }

  /** ADC top-k: rank the frozen centroids driver-side, scan ONLY the
    * nProbe nearest cells' file-sets (partition-name pruned), score the
    * m-byte codes against the broadcast query tables, tie-stable cut on
    * the 4-decimal rounded score. No raw vectors anywhere — this is the
    * memory-bounded probe shape. */
  def probeTopK(spark: SparkSession, root: String, query: Seq[Float],
                k: Int, nProbe: Int,
                idCol: String = "vec_id"): DataFrame = {
    val centroids = readCentroids(spark, root)
    val cb = readCodebook(spark, root)
    val cells = Similarity.IvfIndex(centroids, null).probeCells(query, nProbe)
    // residual mode: codes quantize r = v − c_cell, so the estimated
    // inner product is q·c_cell (a per-cell scalar, broadcast literal,
    // looked up from the row's OWN cell column) plus the ADC sum q·r̃ —
    // the tables stay cell-independent because the dot product is
    // linear, FAISS's IP-mode IVFADC decomposition
    val adc = Similarity.pqAdcScoreExpr(col("codes"), cb, query)
    val score =
      if (!isResidual(spark, root)) adc
      else {
        val qd = query.map(_.toDouble).toArray
        val cellDots = centroids.map(c =>
          c.zip(qd).map { case (a, b) => a * b }.sum).toSeq
        element_at(typedlit(cellDots), col(CellCol).cast("int") + 1) + adc
      }
    AnnSync.prunedCells(VersionedTable(spark, root), CellCol,
      cells.map(_.toLong))
      .select(col(idCol), round(score, 4).as("pq_score4"))
      .orderBy(col("pq_score4").desc, col(idCol).asc)
      .limit(k)
  }

  private def isResidual(spark: SparkSession, root: String): Boolean =
    scala.util.Try(Sidecar.read(spark, root, ResidualSidecar))
      .toOption.contains("1")

  private def readCentroids(spark: SparkSession,
                            root: String): Array[Array[Double]] =
    Sidecar.read(spark, root, CentroidsSidecar)
      .split("\n").map(_.split(",").map(_.toDouble))

  private def readCodebook(spark: SparkSession,
                           root: String): Similarity.PqCodebook =
    Similarity.pqCodebookFromText(Sidecar.read(spark, root, CodebookSidecar))
}
