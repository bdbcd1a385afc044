package graft.ops

import graft.SparkSpec
import graft.tables.VersionedTable
import org.apache.spark.sql.functions._

/** HLL sketch rollups ([[Sketches]]): union-of-partials ≡ one-shot
  * build, incremental append maintenance, retraction fallback. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int, mod: Int) =
    (0 until n).map(i => (s"g${i % 2}", (i % mod).toLong))

  private def estimates(mv: VersionedTable): Map[String, (Long, Double)] =
    Sketches.withEstimate(mv.read)
      .select("g", "n_rows", "approx_distinct")
      .as[(String, Long, Double)].collect()
      .map { case (g, n, e) => g -> ((n, e)) }.toMap

  test("incrementally merged sketches give EXACTLY the one-shot " +
       "estimate (register-wise max is a monoid)") {
    val root = tmpDir("sk-")
    val src = VersionedTable(spark, s"$root/src")
    val mv = VersionedTable(spark, s"$root/mv")
    src.append(rows(5000, 700).toDF("g", "k"))
    Sketches.create(src, mv, Seq("g"), "k")
    src.append(rows(5000, 900).map { case (g, k) => (g, k + 500) }
      .toDF("g", "k"))
    assert(Sketches.refresh(spark, mv) === "incremental")
    val oneShot = Sketches.withEstimate(
        Sketches.rollup(src.read, Seq("g"), "k"))
      .select("g", "n_rows", "approx_distinct")
      .as[(String, Long, Double)].collect()
      .map { case (g, n, e) => g -> ((n, e)) }.toMap
    assert(estimates(mv) === oneShot,
      "union of partials must equal the full build, not merely approximate it")
    // the estimate itself lands near truth
    val exact = src.read.groupBy("g").agg(countDistinct("k").as("d"))
      .as[(String, Long)].collect().toMap
    estimates(mv).foreach { case (g, (_, est)) =>
      assert(math.abs(est / exact(g).toDouble - 1.0) < 0.05,
        s"group $g estimate $est vs exact ${exact(g)}")
    }
  }

  test("noop on no movement and on compaction; retraction rebuilds") {
    val root = tmpDir("sk2-")
    val src = VersionedTable(spark, s"$root/src")
    val mv = VersionedTable(spark, s"$root/mv")
    src.append(rows(2000, 300).toDF("g", "k"))
    Sketches.create(src, mv, Seq("g"), "k")
    assert(Sketches.refresh(spark, mv) === "noop")
    src.compact()
    assert(Sketches.refresh(spark, mv) === "noop")
    val mvV = mv.latestVersion.get
    src.delete(col("k") < 100L)
    assert(Sketches.refresh(spark, mv) === "full",
      "HLL registers cannot retract — deletes must rebuild")
    assert(mv.latestVersion.get > mvV)
    val exact = src.read.groupBy("g").agg(countDistinct("k").as("d"))
      .as[(String, Long)].collect().toMap
    estimates(mv).foreach { case (g, (n, est)) =>
      assert(n === src.read.filter(col("g") === g).count())
      assert(math.abs(est / exact(g).toDouble - 1.0) < 0.05)
    }
  }

  test("crash replay: a stale covered-version property replays the " +
       "merge as a txn no-op") {
    val root = tmpDir("sk3-")
    val src = VersionedTable(spark, s"$root/src")
    val mv = VersionedTable(spark, s"$root/mv")
    src.append(rows(1000, 200).toDF("g", "k"))
    Sketches.create(src, mv, Seq("g"), "k")
    val covered = mv.properties(Sketches.VersionProp)
    src.append(rows(1000, 400).toDF("g", "k"))
    assert(Sketches.refresh(spark, mv) === "incremental")
    val snap = estimates(mv)
    val mvV = mv.latestVersion.get
    mv.setProperties(Map(Sketches.VersionProp -> covered))
    assert(Sketches.refresh(spark, mv) === "noop",
      "the txn ledger must recognize the absorbed slice")
    assert(estimates(mv) === snap)
    assert(mv.latestVersion.get === mvV)
  }
}
