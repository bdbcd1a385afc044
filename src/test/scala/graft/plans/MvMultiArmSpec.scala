package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.VersionedTable

/** Multi-arm MV routing: tables that took metadata DDL (type widening,
  * ADD/RENAME/DROP COLUMN) or carry deletion vectors read as a union of
  * projected arms (or a DV anti-join) — registration decomposes that
  * shape and routing still serves, while user-projected look-alikes and
  * any data/DV commit stay un-served. */
class MvMultiArmSpec extends SparkSpec {
  import spark.implicits._

  private def scanned(df: DataFrame): Seq[String] = MvRewrite.scannedPaths(df)
  private def servesMv(df: DataFrame): Boolean = {
    val p = scanned(df)
    p.nonEmpty && p.forall(_.contains("/mv/"))
  }

  private def registerSum(src: VersionedTable, mv: VersionedTable): Unit = {
    mv.overwrite(src.read.groupBy("k").agg(
      sum("v").as("sum_v"), count(lit(1)).as("cnt")))
    MvRewrite.register(src, mv, Seq("k"), Seq(
      MvRewrite.AggSpec("sum", "v", "sum_v"),
      MvRewrite.AggSpec("count", "*", "cnt")))
  }

  test("widened source (mixed-width union arms) arms and serves; a data " +
       "commit still un-arms") {
    MvRewrite.install(spark)
    val root = tmpDir("mvma-widen-")
    val src = new VersionedTable(spark, s"$root/src")
    val mv = new VersionedTable(spark, s"$root/mv")
    src.append(Seq(("a", 1), ("b", 2)).toDF("k", "v"))
    src.widenColumnType("v", org.apache.spark.sql.types.LongType)
    src.append(Seq(("b", 5_000_000_000L)).toDF("k", "v"))
    registerSum(src, mv)
    try {
      val q = src.read.groupBy("k").agg(sum("v").as("s"))
      assert(servesMv(q), s"expected MV scan, got ${scanned(q)}")
      assert(q.orderBy("k").as[(String, Long)].collect().toSeq ===
        Seq(("a", 1L), ("b", 5_000_000_002L)))
      // rollup over the widened table serves too
      val g = src.read.agg(sum("v").as("s"))
      assert(servesMv(g), s"expected MV scan, got ${scanned(g)}")
      assert(g.as[Long].head() === 5_000_000_003L)
      // freshness: one more append un-arms
      src.append(Seq(("a", 7L)).toDF("k", "v"))
      val q2 = src.read.groupBy("k").agg(sum("v").as("s"))
      assert(!servesMv(q2), "stale MV must not serve after a commit")
      assert(q2.filter($"k" === "a").as[(String, Long)].head()._2 === 8L)
    } finally MvRewrite.deregister(mv)
  }

  test("ADD COLUMN (null-padded arm) and DROP COLUMN arms register and " +
       "serve") {
    MvRewrite.install(spark)
    val root = tmpDir("mvma-addcol-")
    val src = new VersionedTable(spark, s"$root/src")
    val mv = new VersionedTable(spark, s"$root/mv")
    src.append(Seq(("a", 1L, "z"), ("b", 2L, "y")).toDF("k", "v", "junk"))
    src.addColumns("extra INT")
    src.dropColumn("junk")
    registerSum(src, mv)
    try {
      val q = src.read.groupBy("k").agg(sum("v").as("s"))
      assert(servesMv(q), s"expected MV scan, got ${scanned(q)}")
      assert(q.orderBy("k").as[(String, Long)].collect().toSeq ===
        Seq(("a", 1L), ("b", 2L)))
    } finally MvRewrite.deregister(mv)
  }

  test("RENAME COLUMN after registration: untouched-column rename keeps " +
       "serving (data unchanged), renamed group column falls back") {
    MvRewrite.install(spark)
    val root = tmpDir("mvma-ren-")
    val src = new VersionedTable(spark, s"$root/src")
    val mv = new VersionedTable(spark, s"$root/mv")
    src.append(Seq(("a", 1L, 9L), ("b", 2L, 8L)).toDF("k", "v", "other"))
    registerSum(src, mv)
    try {
      // rename a column the MV never touched — the snapshot's DATA is
      // unchanged (file-sets carried verbatim), so the MV keeps serving
      src.renameColumn("other", "renamed")
      val q = src.read.groupBy("k").agg(sum("v").as("s"))
      assert(servesMv(q), s"expected MV scan, got ${scanned(q)}")
      assert(q.orderBy("k").as[(String, Long)].collect().toSeq ===
        Seq(("a", 1L), ("b", 2L)))
      // rename the GROUP column — the query now groups by a name the
      // registration does not carry; falls back to the source, correct
      src.renameColumn("k", "kk")
      val q2 = src.read.groupBy("kk").agg(sum("v").as("s"))
      assert(!servesMv(q2), "renamed group column must not serve")
      assert(q2.orderBy("kk").as[(String, Long)].collect().toSeq ===
        Seq(("a", 1L), ("b", 2L)))
    } finally MvRewrite.deregister(mv)
  }

  test("post-DDL registration serves a pushed-down filter on the group " +
       "column (hoisted back through every arm)") {
    MvRewrite.install(spark)
    val root = tmpDir("mvma-filter-")
    val src = new VersionedTable(spark, s"$root/src")
    val mv = new VersionedTable(spark, s"$root/mv")
    src.append(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v"))
    src.widenColumnType("v", org.apache.spark.sql.types.LongType)
    registerSum(src, mv)
    try {
      val q = src.read.filter($"k" =!= "c").groupBy("k")
        .agg(sum("v").as("s"))
      assert(servesMv(q), s"expected MV scan, got ${scanned(q)}")
      assert(q.orderBy("k").as[(String, Long)].collect().toSeq ===
        Seq(("a", 1L), ("b", 2L)))
      // a filter on a NON-group column cannot serve from group-level rows
      val q2 = src.read.filter($"v" > 1L).groupBy("k")
        .agg(sum("v").as("s"))
      assert(!servesMv(q2))
      assert(q2.orderBy("k").as[(String, Long)].collect().toSeq ===
        Seq(("b", 2L), ("c", 3L)))
    } finally MvRewrite.deregister(mv)
  }

  test("DV-bearing source arms and serves; a new DV delete un-arms") {
    MvRewrite.install(spark)
    val root = tmpDir("mvma-dv-")
    val src = new VersionedTable(spark, s"$root/src")
    val mv = new VersionedTable(spark, s"$root/mv")
    src.append(Seq(("a", 1L), ("a", 10L), ("b", 2L)).toDF("k", "v"))
    src.deleteVectors($"v" === 10L)
    registerSum(src, mv)
    try {
      val q = src.read.groupBy("k").agg(sum("v").as("s"))
      assert(servesMv(q), s"expected MV scan, got ${scanned(q)}")
      assert(q.orderBy("k").as[(String, Long)].collect().toSeq ===
        Seq(("a", 1L), ("b", 2L)))
      // a NEW deletion vector changes the DV path set — must un-arm
      // (the MV no longer reflects the snapshot)
      src.deleteVectors($"k" === "b")
      val q2 = src.read.groupBy("k").agg(sum("v").as("s"))
      assert(!servesMv(q2), "post-delete snapshot must not serve")
      assert(q2.orderBy("k").as[(String, Long)].collect().toSeq ===
        Seq(("a", 1L)))
    } finally MvRewrite.deregister(mv)
  }

  test("two covering MVs: the rollup serves from the COARSER (smaller) " +
       "one") {
    MvRewrite.install(spark)
    val root = tmpDir("mvma-cost-")
    val src = new VersionedTable(spark, s"$root/src")
    val fine = new VersionedTable(spark, s"$root/mvfine")
    val coarse = new VersionedTable(spark, s"$root/mvcoarse")
    src.append(Seq(("a", "x", 1L), ("a", "y", 2L), ("b", "x", 3L),
      ("b", "y", 4L), ("c", "x", 5L)).toDF("g", "sub", "v"))
    fine.overwrite(src.read.groupBy("g", "sub").agg(
      sum("v").as("sum_v"), count(lit(1)).as("cnt")))
    coarse.overwrite(src.read.groupBy("g").agg(
      sum("v").as("sum_v"), count(lit(1)).as("cnt")))
    val aggs = Seq(MvRewrite.AggSpec("sum", "v", "sum_v"),
      MvRewrite.AggSpec("count", "*", "cnt"))
    // register the FINE one first — order must not decide the pick
    MvRewrite.register(src, fine, Seq("g", "sub"), aggs)
    MvRewrite.register(src, coarse, Seq("g"), aggs)
    try {
      val q = src.read.groupBy("g").agg(sum("v").as("s"))
      val paths = MvRewrite.scannedPaths(q)
      assert(paths.nonEmpty && paths.forall(_.contains("/mvcoarse/")),
        s"expected the coarser MV (3 rows vs 5), got $paths")
      assert(q.orderBy("g").as[(String, Long)].collect().toSeq ===
        Seq(("a", 3L), ("b", 7L), ("c", 5L)))
      // a (g, sub) query is only coverable by the fine MV
      val q2 = src.read.groupBy("g", "sub").agg(sum("v").as("s"))
      assert(MvRewrite.scannedPaths(q2).forall(_.contains("/mvfine/")))
      assert(q2.count() === 5L)
    } finally { MvRewrite.deregister(fine); MvRewrite.deregister(coarse) }
  }

  test("time travel to the COVERED version serves from the MV even after " +
       "the head moves (the registration pins a snapshot, not the head)") {
    MvRewrite.install(spark)
    val root = tmpDir("mvma-tt-")
    val src = new VersionedTable(spark, s"$root/src")
    val mv = new VersionedTable(spark, s"$root/mv")
    src.append(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"))
    val covered = src.latestVersion.get
    registerSum(src, mv)
    try {
      src.append(Seq(("a", 100L)).toDF("k", "v")) // head moves on
      // the head query falls back (stale MV)...
      assert(!servesMv(src.read.groupBy("k").agg(sum("v").as("s"))))
      // ...but the covered snapshot IS what the MV materializes — the
      // time-travel aggregate serves from it indefinitely (even after
      // vacuum would reclaim the old source files)
      val q = src.readVersion(covered).groupBy("k").agg(sum("v").as("s"))
      assert(servesMv(q), s"expected MV scan, got ${scanned(q)}")
      assert(q.orderBy("k").as[(String, Long)].collect().toSeq ===
        Seq(("a", 1L), ("b", 2L)))
    } finally MvRewrite.deregister(mv)
  }

  test("hand-built unions over the registered snapshot's files never " +
       "serve: self-union, version-union, cross-version union") {
    MvRewrite.install(spark)
    val root = tmpDir("mvma-union-")
    val src = new VersionedTable(spark, s"$root/src")
    val mv = new VersionedTable(spark, s"$root/mv")
    src.append(Seq(("a", 1L), ("b", 2L)).toDF("k", "v")) // v0
    src.append(Seq(("c", 3L)).toDF("k", "v"))            // v1
    registerSum(src, mv)
    try {
      // self-union: same files twice — double-counts; ambiguous-arm
      // identity bails the decomposition
      val dbl = src.read.union(src.read).groupBy("k").agg(sum("v").as("s"))
      assert(!servesMv(dbl), s"self-union must not serve")
      assert(dbl.count() === 3L)
      // readVersion(v0) ∪ readAddedSince(v0) — semantically EQUALS the
      // head, but its arm partition differs from the registered fold;
      // conservative fallback (correct either way)
      val stitched = src.readVersion(0L).union(src.readAddedSince(0L))
        .groupBy("k").agg(sum("v").as("s"))
      assert(!servesMv(stitched))
      assert(stitched.orderBy("k").as[(String, Long)].collect().toSeq ===
        Seq(("a", 1L), ("b", 2L), ("c", 3L)))
      // an OLD snapshot (subset of the head's files) must not serve the
      // head's MV
      val old = src.readVersion(0L).groupBy("k").agg(sum("v").as("s"))
      assert(!servesMv(old))
      assert(old.count() === 2L)
    } finally MvRewrite.deregister(mv)
  }

  test("a user projection re-aliasing columns over the SAME files never " +
       "impersonates the table read") {
    MvRewrite.install(spark)
    val root = tmpDir("mvma-swap-")
    val src = new VersionedTable(spark, s"$root/src")
    val mv = new VersionedTable(spark, s"$root/mv")
    // k and v share a type so a swapped read would type-check; ADD
    // COLUMN makes the read multi-arm (the permissive shape)
    src.append(Seq((1L, 100L), (2L, 200L)).toDF("k", "v"))
    src.addColumns("extra INT")
    registerSum(src, mv)
    try {
      // swap the columns: groupBy("k") now aggregates what the files
      // call v — the arm descriptors (k := a:v) match no registration
      val swapped = src.read.select($"v".as("k"), $"k".as("v"))
        .groupBy("k").agg(sum("v").as("s"))
      assert(!servesMv(swapped),
        s"swapped projection must not serve, got ${scanned(swapped)}")
      assert(swapped.orderBy("k").as[(Long, Long)].collect().toSeq ===
        Seq((100L, 1L), (200L, 2L)))
      // derived columns bail the same way
      val derived = src.read.select($"k", ($"v" + 1L).as("v"))
        .groupBy("k").agg(sum("v").as("s"))
      assert(!servesMv(derived))
    } finally MvRewrite.deregister(mv)
  }
}
