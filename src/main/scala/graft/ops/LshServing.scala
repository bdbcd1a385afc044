package graft.ops

import graft.tables.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incrementally-maintained LSH ANN serving table — [[IvfServing]]'s
  * sibling over the sign-bit bucket family: the quantizer here is the
  * hyperplane set (numPlanes, dim, seed), which needs NO training, so
  * "frozen" is simply the persisted `_lshspec.csv` the probe path
  * already trusts ([[Similarity.writeLshTable]]'s contract). Everything
  * else — the cell-partitioned [[VersionedTable]] layout, the
  * two-merge O(changed) sync off the source's change feed, the
  * epoch-scoped idempotent txn markers, the partition-name-pruned
  * probes — is the shared [[AnnSync]] core.
  *
  * When to rebuild: unlike IVF centroids, hyperplanes never drift with
  * the corpus — a rebuild ([[build]] with `overwritePlanes`) is only
  * needed to change numPlanes (bucket granularity) or the seed.
  */
object LshServing {

  val BucketCol = "lsh_bucket"
  private val SpecSidecar = "_lshspec.csv"
  private def syncDir(root: String) = root + "/_sync"

  private def txnAppId(spark: SparkSession, root: String): String =
    s"lsh-sync:$root:e${AnnSync.epochOf(spark, root)}"

  private def readSpec(spark: SparkSession,
                       root: String): (Int, Int, Long) = {
    val Array(np, dim, seed) =
      Sidecar.read(spark, root, SpecSidecar).split(",").map(_.toLong)
    (np.toInt, dim.toInt, seed)
  }

  /** Freeze the plane spec and run the first [[sync]] (bootstraps from
    * the source's CDF `-1` form). Refuses to replace an existing spec
    * unless `overwritePlanes` (which truncates and re-syncs). */
  def build(src: VersionedTable, root: String, numPlanes: Int, dim: Int,
            idCol: String = "vec_id", vecCol: String = "embedding",
            seed: Long = 42L, numBuckets: Int = 8,
            overwritePlanes: Boolean = false): Option[(Long, Long)] = {
    val spark = src.spark
    require(src.changeFeedEnabled,
      s"LshServing.build: enable the change feed on ${src.root} first " +
        "(sync consumes it to classify updates and deletes)")
    val hasSpec =
      scala.util.Try(Sidecar.read(spark, root, SpecSidecar)).isSuccess
    require(!hasSpec || overwritePlanes,
      s"LshServing.build: plane spec already frozen at $root " +
        "(pass overwritePlanes=true to replace and rebuild)")
    if (hasSpec) {
      // epoch BEFORE reset — see IvfServing.build: a truncate under the
      // old epoch would let stale txn markers swallow the re-bootstrap
      AnnSync.bumpEpoch(spark, root)
      AnnSync.resetServing(spark, root, syncDir(root), BucketCol)
    }
    Sidecar.write(spark, root, SpecSidecar, s"$numPlanes,$dim,$seed")
    sync(src, root, idCol, vecCol, numBuckets)
  }

  /** Consume every unconsumed source commit into the serving table —
    * O(changed vectors) per call, see [[AnnSync.syncInto]]. */
  def sync(src: VersionedTable, root: String,
           idCol: String = "vec_id", vecCol: String = "embedding",
           numBuckets: Int = 8,
           autoCompactCellsOver: Option[Int] = Some(8)): Option[(Long, Long)] = {
    val spark = src.spark
    graft.functions.GraftFunctions.register(spark)
    val (numPlanes, dim, seed) = readSpec(spark, root)
    val planes = Similarity.hyperplanes(numPlanes, dim, seed)
    AnnSync.syncInto(src, root, syncDir(root), idCol, vecCol, BucketCol,
      vec => Similarity.lshBucket(vec, planes),
      txnAppId(spark, root), numBuckets, autoCompactCellsOver)
  }

  /** Multiprobe top-k: enumerate buckets within `probeHamming` bits of
    * the query's bucket, scan only those buckets' file-sets (pruned by
    * partition name), exact re-rank ([[AnnSync.probeRank]]). Planes
    * come from the sidecar spec, never the caller. */
  def probeTopK(spark: SparkSession, root: String, query: Seq[Float],
                k: Int, probeHamming: Int = 1, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val (numPlanes, dim, seed) = readSpec(spark, root)
    require(dim == query.size,
      s"query dim ${query.size} != indexed dim $dim at $root")
    val planes = Similarity.hyperplanes(numPlanes, dim, seed)
    val buckets = Similarity.multiprobeBuckets(
      Similarity.queryBucket(planes, query), numPlanes, probeHamming)
    AnnSync.probeRank(VersionedTable(spark, root), BucketCol,
      buckets, query, k, idCol, vecCol)
  }
}
