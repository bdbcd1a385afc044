package graft.ops

import graft.SparkSpec
import graft.tables.VersionedTable
import org.apache.spark.sql.functions._

/** IVF-PQ composed serving ([[IvfPqServing]]): codes stored instead of
  * raw vectors, frozen coarse quantizer + frozen codebook, CDF-driven
  * O(changed) sync, ADC probe over partition-pruned cells. */
class IvfPqServingSpec extends SparkSpec {
  import spark.implicits._

  /** Block-structured corpus (the PQ lossless case): two 4-dim
    * subspaces, each a one-hot pattern scaled by one of three
    * amplitudes — ≤ 12 distinct patterns per subspace, so a k=16
    * codebook covers every one exactly and ADC equals true inner
    * product. */
  private def blockCorpus(n: Int): Seq[(Long, Seq[Float])] =
    (0 until n).map { i =>
      val amp = 0.25f * ((i % 3) + 1)
      val p1 = i % 4
      val p2 = (i / 4) % 4
      val v = Array.fill(8)(0f)
      v(p1) = amp; v(4 + p2) = amp
      (i.toLong, v.toSeq)
    }

  private def freshSource(rows: Seq[(Long, Seq[Float])]): VersionedTable = {
    val t = VersionedTable(spark, tmpDir("ivfpq-src-") + "/emb")
    t.enableChangeFeed()
    t.append(rows.toDF("vec_id", "embedding"))
    t
  }

  test("build bootstraps; serving stores CODES (no raw vectors); full " +
       "probe equals pqTopK over the encoded source") {
    val base = blockCorpus(96)
    val src = freshSource(base)
    val root = tmpDir("ivfpq-serve-") + "/t"
    assert(IvfPqServing.build(src, root, nCells = 3, m = 2, seed = 1L,
      numBuckets = 2).isDefined)
    val serving = VersionedTable(spark, root)
    assert(serving.read.count() === 96)
    // the memory-bounded shape: codes + cell, never the raw vector
    assert(serving.read.columns.toSet === Set("vec_id", "codes",
      IvfPqServing.CellCol))
    val q = base(5)._2
    val got = IvfPqServing.probeTopK(spark, root, q, k = 10, nProbe = 3)
      .as[(Long, Double)].collect().toSeq
    val cb = Similarity.pqTrain(src.read, m = 2, seed = 1L)
    val want = Similarity.pqTopK(
      Similarity.pqEncode(src.read, cb), cb, q, 10)
      .as[(Long, Double)].collect().toSeq
    assert(got === want)
    // lossless corpus: the ADC self-hit scores the true inner product
    val selfIp = q.map(x => x * x).sum.toDouble
    assert(got.head._1 === 5L)
    assert(math.abs(got.head._2 - math.floor(selfIp * 1e4 + 0.5) / 1e4) < 1e-9)
  }

  test("sync applies inserts, updates and deletes in O(changed) merges; " +
       "probe serves post-mutation state through the frozen codebook") {
    val base = blockCorpus(90)
    val src = freshSource(base)
    val root = tmpDir("ivfpq-serve-") + "/t"
    IvfPqServing.build(src, root, nCells = 3, m = 2, seed = 1L,
      numBuckets = 2)
    val serving = VersionedTable(spark, root)
    val v0 = serving.latestVersion.get

    // mutate: 8 fresh ids (block-patterned), 4 moved, 6 deleted
    val fresh = blockCorpus(8).map { case (i, v) => (1000L + i, v) }
    src.append(fresh.toDF("vec_id", "embedding"))
    val moved = blockCorpus(20).slice(16, 20)
      .map { case (i, v) => (i / 2, v) }
    src.merge(moved.toDF("vec_id", "embedding"), Seq("vec_id"))
    src.delete(col("vec_id") >= 80L && col("vec_id") < 86L)
    assert(IvfPqServing.sync(src, root, numBuckets = 2).isDefined)

    // converged ids, no duplicate postings, ≤2 commits past bootstrap
    val gotIds = serving.read.select("vec_id").as[Long].collect().toSet
    val wantIds = src.read.select("vec_id").as[Long].collect().toSet
    assert(gotIds === wantIds)
    assert(serving.read.count() ===
      serving.read.select("vec_id").distinct().count())
    assert(serving.latestVersion.get <= v0 + 2)

    // full probe == pqTopK over the CURRENT corpus encoded with the
    // FROZEN codebook (the serving table's exact contract)
    val cb = Similarity.pqTrain(
      src.readVersion(0L), m = 2, seed = 1L)
    val q = base(7)._2
    val got = IvfPqServing.probeTopK(spark, root, q, k = 8, nProbe = 3)
      .as[(Long, Double)].collect().toSeq
    val want = Similarity.pqTopK(
      Similarity.pqEncode(src.read, cb), cb, q, 8)
      .as[(Long, Double)].collect().toSeq
    assert(got === want)
  }

  test("a crash-replayed sync range is a metadata no-op (txn markers)") {
    val src = freshSource(blockCorpus(48))
    val root = tmpDir("ivfpq-serve-") + "/t"
    IvfPqServing.build(src, root, nCells = 2, m = 2, seed = 1L,
      numBuckets = 2)
    src.append(blockCorpus(4).map { case (i, v) => (500L + i, v) }
      .toDF("vec_id", "embedding"))
    src.delete(col("vec_id") === 7L)
    assert(IvfPqServing.sync(src, root, numBuckets = 2).isDefined)
    val serving = VersionedTable(spark, root)
    val vAfter = serving.latestVersion.get
    val pos = java.nio.file.Paths.get(root, "_sync", "position")
    java.nio.file.Files.writeString(pos, "0")
    assert(IvfPqServing.sync(src, root, numBuckets = 2).isDefined)
    assert(serving.latestVersion.get === vAfter)
    assert(serving.read.count() === 51)
    assert(IvfPqServing.sync(src, root, numBuckets = 2).isEmpty)
  }

  test("residual mode (IVFADC proper): lossless corpus full-probe scores " +
       "equal TRUE inner products; mutation syncs through the residual " +
       "encode") {
    val base = blockCorpus(96)
    val src = freshSource(base)
    val root = tmpDir("ivfpq-res-") + "/t"
    // ≤12 distinct patterns per subspace × 2 cells ⇒ ≤24 distinct
    // RESIDUAL patterns; k = 32 covers every one exactly, so
    // q·c_cell + ADC == q·v up to float rounding ≪ the 4-decimal grid
    IvfPqServing.build(src, root, nCells = 2, m = 2, k = 32, seed = 1L,
      numBuckets = 2, residual = true)
    val q = base(5)._2
    def wantTop(n: Int): Seq[(Long, Double)] = {
      val qLit = typedlit(q.map(_.toDouble).toSeq)
      src.read.select($"vec_id",
          round(aggregate(zip_with($"embedding".cast("array<double>"),
            qLit, (x, y) => x * y), lit(0.0d), (a, v) => a + v), 4)
            .as("ip"))
        .orderBy(col("ip").desc, $"vec_id".asc).limit(n)
        .as[(Long, Double)].collect().toSeq
    }
    val got = IvfPqServing.probeTopK(spark, root, q, k = 10, nProbe = 2)
      .as[(Long, Double)].collect().toSeq
    assert(got === wantTop(10))
    // mutate: delete the query vector's id, add a clone under a new id
    src.delete(col("vec_id") === 5L)
    src.append(Seq((500L, q.toSeq)).toDF("vec_id", "embedding"))
    assert(IvfPqServing.sync(src, root, numBuckets = 2).isDefined)
    val got2 = IvfPqServing.probeTopK(spark, root, q, k = 10, nProbe = 2)
      .as[(Long, Double)].collect().toSeq
    assert(got2 === wantTop(10))
    // the pattern is shared (ids ≡ 5 mod 48 carry the identical vector),
    // so the clone ties with them and the id tiebreak orders it last of
    // the perfect hits — present at full score, while 5 is gone
    assert(got2.exists(_._1 == 500L), "the cloned vector must serve")
    assert(got2.find(_._1 == 500L).map(_._2) === got2.headOption.map(_._2),
      "the clone scores the full self-hit value")
    assert(!got2.exists(_._1 == 5L))
  }

  test("codebook sidecar round-trips uneven per-subspace centroid counts") {
    val cb = Similarity.PqCodebook(2, 16, 2, Array(
      Array(Array(0.5f, 1.5f), Array(2.5f, 3.5f), Array(4.5f, 5.5f)),
      Array(Array(9.0f, 8.0f))))
    val back = Similarity.pqCodebookFromText(Similarity.pqCodebookToText(cb))
    assert(back.m === 2 && back.k === 16 && back.subDim === 2)
    assert(back.centroids.map(_.map(_.toSeq).toSeq).toSeq ===
      cb.centroids.map(_.map(_.toSeq).toSeq).toSeq)
  }
}
