package graft.ops

import graft.SparkSpec
import graft.tables.VersionedTable
import org.apache.spark.sql.functions._

/** LSH flavor of the incrementally-maintained ANN serving table
  * ([[LshServing]]); the shared sync core's crash-replay / refit /
  * pruning behavior is pinned in IvfServingSpec. */
class LshServingSpec extends SparkSpec {
  import spark.implicits._

  private def mkVectors(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
  }

  test("bootstrap + incremental sync converge; full-radius probe is exact") {
    val base = mkVectors(150, 8, seed = 21)
    val src = VersionedTable(spark, tmpDir("lsh-src-") + "/emb")
    src.enableChangeFeed()
    src.append(base.toDF("vec_id", "embedding"))
    val root = tmpDir("lsh-serve-") + "/t"
    // 4 planes -> 16 buckets; full Hamming radius enumerates them all
    assert(LshServing.build(src, root, numPlanes = 4, dim = 8,
      numBuckets = 4).isDefined)
    val serving = VersionedTable(spark, root)
    assert(serving.read.count() === 150)

    // mutate: 8 fresh, 4 re-embedded (bucket moves likely), 5 deleted
    src.append(mkVectors(8, 8, seed = 22).map { case (i, v) =>
      (900L + i, v) }.toDF("vec_id", "embedding"))
    val moved = mkVectors(4, 8, seed = 23).map { case (i, v) => (i * 3L, v) }
    src.merge(moved.toDF("vec_id", "embedding"), Seq("vec_id"))
    src.delete(col("vec_id").between(60L, 64L))
    assert(LshServing.sync(src, root).isDefined)

    val gotIds = serving.read.select("vec_id").as[Long].collect().toSet
    assert(gotIds === src.read.select("vec_id").as[Long].collect().toSet)
    assert(serving.read.count() ===
      serving.read.select("vec_id").distinct().count()) // no dup postings
    // full-radius probe == brute force over the CURRENT source
    val q = moved(1)._2
    val got = LshServing.probeTopK(spark, root, q, k = 5,
      probeHamming = 4).select("vec_id").as[Long].collect().toSeq
    val want = Similarity.bruteForceTopK(src.read, q, 5)
      .select("vec_id").as[Long].collect().toSeq
    assert(got === want)
    assert(got.head === moved(1)._1) // self-hit at the new embedding
    // narrow probe still finds an identical vector (same bucket)
    val narrow = LshServing.probeTopK(spark, root, q, k = 1,
      probeHamming = 0).select("vec_id").as[Long].collect()
    assert(narrow.headOption === Some(moved(1)._1))
  }

  test("build refuses a silent plane swap; rebuild with overwritePlanes") {
    val src = VersionedTable(spark, tmpDir("lsh-src-") + "/emb")
    src.enableChangeFeed()
    src.append(mkVectors(30, 4, seed = 29).toDF("vec_id", "embedding"))
    val root = tmpDir("lsh-serve-") + "/t"
    LshServing.build(src, root, numPlanes = 3, dim = 4)
    assertThrows[IllegalArgumentException](
      LshServing.build(src, root, numPlanes = 5, dim = 4))
    LshServing.build(src, root, numPlanes = 5, dim = 4,
      overwritePlanes = true)
    assert(VersionedTable(spark, root).read.count() === 30)
    val q = mkVectors(30, 4, seed = 29)(7)._2
    assert(LshServing.probeTopK(spark, root, q, k = 1, probeHamming = 5)
      .select("vec_id").as[Long].head() === 7L)
  }
}
