package graft.ops

import graft.SparkSpec
import graft.tables.VersionedTable
import org.apache.spark.sql.functions._

/** Incrementally-maintained IVF serving table ([[IvfServing]]): frozen
  * quantizer, CDF-driven O(changed) sync into a cell-partitioned
  * layout, partition-pruned cell probes. */
class IvfServingSpec extends SparkSpec {
  import spark.implicits._

  private def mkVectors(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
  }

  private def freshSource(rows: Seq[(Long, Seq[Float])]): VersionedTable = {
    val t = VersionedTable(spark, tmpDir("ivf-src-") + "/emb")
    t.enableChangeFeed()
    t.append(rows.toDF("vec_id", "embedding"))
    t
  }

  test("build bootstraps the serving table to the source snapshot") {
    val base = mkVectors(120, 8, seed = 3)
    val src = freshSource(base)
    val root = tmpDir("ivf-serve-") + "/t"
    val range = IvfServing.build(src, root, nCells = 4, seed = 1L)
    assert(range.isDefined)
    val serving = VersionedTable(spark, root)
    assert(serving.read.count() === 120)
    // the layout is one file-set per (cell, bucket): hex-encoded
    // partition tags in the file-set NAMES (`.p<hex>.b#####`) are what
    // probe pruning keys on — cell 0 encodes as hex("0") = "30"
    val sets = serving.history.last.fileSets
    assert(sets.forall(_.matches(""".*\.p[0-9A-FN~]+\.b\d+$""")))
    assert(sets.exists(_.contains(".p30.")))
    // with nProbe = nCells the probe is exact brute force — same ids,
    // same order as the ground truth on the source
    val query = base(17)._2
    val got = IvfServing.probeTopK(spark, root, query, k = 5, nProbe = 4)
      .select("vec_id").as[Long].collect().toSeq
    val want = Similarity.bruteForceTopK(src.read, query, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(got === want)
    assert(got.head === 17L) // the planted query vector itself
  }

  test("sync applies inserts, updates and deletes in O(changed) merges") {
    val base = mkVectors(100, 8, seed = 5)
    val src = freshSource(base)
    val root = tmpDir("ivf-serve-") + "/t"
    IvfServing.build(src, root, nCells = 4, seed = 1L)
    val serving = VersionedTable(spark, root)
    val v0 = serving.latestVersion.get

    // mutate the source: 10 new vectors, 5 moved (updated), 7 deleted
    val fresh = mkVectors(10, 8, seed = 9).map { case (i, v) => (1000L + i, v) }
    src.append(fresh.toDF("vec_id", "embedding"))
    val moved = mkVectors(5, 8, seed = 11).map { case (i, v) => (i * 2L, v) }
    src.merge(moved.toDF("vec_id", "embedding"), Seq("vec_id"))
    src.delete(col("vec_id") >= 90L && col("vec_id") < 97L)

    assert(IvfServing.sync(src, root).isDefined)
    // converged: serving snapshot ≡ source snapshot (ids and vectors)
    val gotIds = serving.read.select("vec_id").as[Long].collect().toSet
    val wantIds = src.read.select("vec_id").as[Long].collect().toSet
    assert(gotIds === wantIds)
    assert(!gotIds.exists(id => id >= 90L && id < 97L))
    assert((1000L to 1009L).forall(gotIds.contains))
    // no duplicate postings: a moved vector lives ONLY in its new cell
    assert(serving.read.count() === serving.read
      .select("vec_id").distinct().count())
    // an updated vector is served at its NEW position: probing with the
    // new embedding finds the id at similarity 1.0
    val (mid, mvec) = (moved.head._1, moved.head._2)
    val top = IvfServing.probeTopK(spark, root, mvec, k = 1, nProbe = 4)
      .as[(Long, Double)].head()
    assert(top === ((mid, 1.0)))
    // the sync merged — it did not rebuild: at most two commits past
    // the bootstrap (tombstones into old cells + upserts)
    assert(serving.latestVersion.get === v0 + 2)
    // posting placement agrees with the frozen quantizer: exact top-1
    // self-hit for surviving originals, moved keys and fresh inserts
    Seq(0L, 4L, 40L, 1005L).foreach { id =>
      val v = src.read.filter(col("vec_id") === id)
        .select("embedding").as[Seq[Float]].head()
      val hit = IvfServing.probeTopK(spark, root, v, k = 1, nProbe = 4)
        .select("vec_id").as[Long].head()
      assert(hit === id)
    }
  }

  test("replace_where re-serves the replaced vector at its NEW position — " +
       "the same-commit delete/insert version tie must not drop the posting") {
    val base = mkVectors(80, 8, seed = 21)
    val src = freshSource(base)
    val root = tmpDir("ivf-serve-") + "/t"
    IvfServing.build(src, root, nCells = 4, seed = 1L)
    val serving = VersionedTable(spark, root)
    // ONE commit deletes vec 7 and re-inserts it with a new embedding
    // (plus a net-new vec 9000 in the same commit)
    val newVec = mkVectors(1, 8, seed = 33).head._2
    src.replaceWhere(col("vec_id") === 7L || col("vec_id") === 9000L,
      Seq((7L, newVec), (9000L, mkVectors(1, 8, seed = 34).head._2))
        .toDF("vec_id", "embedding"))
    assert(IvfServing.sync(src, root).isDefined)
    val gotIds = serving.read.select("vec_id").as[Long].collect().toSet
    assert(gotIds.contains(7L) && gotIds.contains(9000L))
    assert(serving.read.count() === serving.read
      .select("vec_id").distinct().count(), "no duplicate postings")
    val top = IvfServing.probeTopK(spark, root, newVec, k = 1, nProbe = 4)
      .as[(Long, Double)].head()
    assert(top === ((7L, 1.0)),
      "the replaced vector must serve at its post-replace position")
  }

  test("a crash-replayed sync range is a metadata no-op (txn markers)") {
    val src = freshSource(mkVectors(60, 8, seed = 7))
    val root = tmpDir("ivf-serve-") + "/t"
    IvfServing.build(src, root, nCells = 3, seed = 1L)
    src.append(mkVectors(5, 8, seed = 8).map { case (i, v) =>
      (500L + i, v) }.toDF("vec_id", "embedding"))
    src.delete(col("vec_id") === 7L)
    assert(IvfServing.sync(src, root).isDefined)
    val serving = VersionedTable(spark, root)
    val vAfter = serving.latestVersion.get
    // crash between the merges and the position commit: wind the
    // position back — the replay re-reads the range, both merges skip
    val pos = java.nio.file.Paths.get(root, "_sync", "position")
    java.nio.file.Files.writeString(pos, "0")
    assert(IvfServing.sync(src, root).isDefined)
    assert(serving.latestVersion.get === vAfter)
    assert(serving.read.count() === 64)
    assert(IvfServing.sync(src, root).isEmpty) // caught up
  }

  test("build refuses a second fit unless overwriteCentroids rebuilds") {
    val src = freshSource(mkVectors(40, 4, seed = 13))
    val root = tmpDir("ivf-serve-") + "/t"
    IvfServing.build(src, root, nCells = 2, seed = 1L)
    assertThrows[IllegalArgumentException](
      IvfServing.build(src, root, nCells = 2, seed = 2L))
    // refit: truncate + re-sync from the CDF bootstrap, new quantizer
    IvfServing.build(src, root, nCells = 2, seed = 2L,
      overwriteCentroids = true)
    val serving = VersionedTable(spark, root)
    assert(serving.read.count() === 40)
    val q = mkVectors(40, 4, seed = 13)(21)._2
    val top = IvfServing.probeTopK(spark, root, q, k = 1, nProbe = 2)
      .select("vec_id").as[Long].head()
    assert(top === 21L)
  }

  test("a rebuild crashed after reset still re-bootstraps (epoch-first)") {
    val src = freshSource(mkVectors(50, 8, seed = 37))
    val root = tmpDir("ivf-serve-") + "/t"
    IvfServing.build(src, root, nCells = 2, seed = 1L)
    assert(VersionedTable(spark, root).read.count() === 50)
    // simulate build(overwriteCentroids=true) crashing right after its
    // epoch bump + reset, before the new quantizer lands: the epoch is
    // fresh, the table is truncated, the position is gone
    AnnSync.bumpEpoch(spark, root)
    AnnSync.resetServing(spark, root, root + "/_sync", IvfServing.CellCol)
    assert(VersionedTable(spark, root).read.count() === 0)
    // the next scheduled sync re-bootstraps under the NEW app id — the
    // old epoch's txn markers must not swallow the replayed versions
    assert(IvfServing.sync(src, root).isDefined)
    assert(VersionedTable(spark, root).read.count() === 50)
  }

  test("auto-compaction folds cells accreted by insert-only syncs") {
    val src = freshSource(mkVectors(40, 8, seed = 31))
    val root = tmpDir("ivf-serve-") + "/t"
    IvfServing.build(src, root, nCells = 2, numBuckets = 2, seed = 1L)
    val serving = VersionedTable(spark, root)
    // ten insert-only syncs: each takes the merge fast path and adds one
    // file-set per touched cell WITHOUT folding — unbounded accretion if
    // nothing compacts. The per-sync auto-compact (threshold 2) folds
    // any (cell, bucket) over 2 sets back to 1, so the final state is
    // bounded no matter how many syncs ran.
    (0 until 10).foreach { i =>
      src.append(mkVectors(5, 8, seed = 100 + i).map { case (j, v) =>
        (10000L + i * 10 + j, v) }.toDF("vec_id", "embedding"))
      assert(IvfServing.sync(src, root, numBuckets = 2,
        autoCompactCellsOver = Some(2)).isDefined)
    }
    val counts = serving.cellFileSetCounts
    assert(counts.nonEmpty)
    assert(counts.forall { case (_, _, n) => n <= 2 },
      s"cell accretion unbounded: $counts")
    // nothing lost through the folds: content still equals the source
    assert(serving.read.select("vec_id").as[Long].collect().toSet ===
      src.read.select("vec_id").as[Long].collect().toSet)
    val q = mkVectors(5, 8, seed = 109)(2)._2 // from the last batch
    assert(IvfServing.probeTopK(spark, root, q, k = 1, nProbe = 2)
      .select("vec_id").as[Long].head() === 10092L)
  }

  test("probe reads open only the probed cells' file-sets") {
    val base = mkVectors(200, 8, seed = 17)
    val src = freshSource(base)
    val root = tmpDir("ivf-serve-") + "/t"
    IvfServing.build(src, root, nCells = 4, seed = 1L)
    val serving = VersionedTable(spark, root)
    val sets = serving.history.last.fileSets
    // cell-partitioned: cell 0's segments (hex tag "30") are a strict,
    // non-empty subset of the file-sets — the probe opens only those
    assert(sets.count(_.contains(".p30.")) < sets.size)
    assert(sets.count(_.contains(".p30.")) > 0)
    // the pruned single-cell read returns exactly the cell-0 postings
    val one = serving.readRange(IvfServing.CellCol, "0", "0")
    val wantCell0 = serving.read
      .filter(col(IvfServing.CellCol) === 0).count()
    assert(one.count() === wantCell0)
    assert(wantCell0 > 0)
  }
}
