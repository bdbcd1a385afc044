package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.VersionedTable

/** The MV routing rule: rewrites fire only on the exact registered
  * snapshot + aggregate shape, produce byte-identical results, and go
  * quiet the moment the source moves (structural staleness). */
class MvRewriteSpec extends SparkSpec {
  import spark.implicits._

  /** Leaf parquet paths of the OPTIMIZED plan — which table a query
    * would actually scan after the rule runs. */
  private def scannedPaths(df: DataFrame): Seq[String] =
    MvRewrite.scannedPaths(df)

  private def fixture(): (VersionedTable, VersionedTable) = {
    val root = tmpDir("graft-mvrw-")
    val src = new VersionedTable(spark, s"$root/src")
    val mv = new VersionedTable(spark, s"$root/mv")
    src.append(Seq(
      ("a", 10L, 1.0), ("a", 20L, 3.0), ("b", 5L, 2.0), ("c", 7L, 4.0))
      .toDF("k", "v", "x"))
    refresh(src, mv)
    (src, mv)
  }

  private def refresh(src: VersionedTable, mv: VersionedTable): Unit = {
    mv.overwrite(src.read.groupBy("k").agg(
      sum("v").as("sum_v"), count(lit(1)).as("cnt"),
      min("v").as("min_v"), max("v").as("max_v"),
      sum("x").as("sum_x"), count("x").as("cnt_x")))
    MvRewrite.register(src, mv, Seq("k"), Seq(
      MvRewrite.AggSpec("sum", "v", "sum_v"),
      MvRewrite.AggSpec("count", "*", "cnt"),
      MvRewrite.AggSpec("min", "v", "min_v"),
      MvRewrite.AggSpec("max", "v", "max_v"),
      MvRewrite.AggSpec("sum", "x", "sum_x"),
      MvRewrite.AggSpec("count", "x", "cnt_x")))
  }

  private def query(src: VersionedTable): DataFrame =
    src.read.groupBy("k").agg(
      sum("v").as("sv"), count(lit(1)).as("n"), min("v").as("mn"),
      max("v").as("mx"), avg("x").as("ax"))

  test("matching aggregate routes to the MV, values identical") {
    MvRewrite.install(spark)
    val (src, mv) = fixture()
    try {
      val expected = src.read.groupBy("k").agg(
        sum("v"), count(lit(1)), min("v"), max("v"), avg("x"))
        .orderBy("k").collect().map(_.toSeq)
      val q = query(src)
      val paths = scannedPaths(q)
      assert(paths.nonEmpty && paths.forall(_.contains("/mv/")),
        s"expected MV-only scan, got $paths")
      assert(q.orderBy("k").collect().map(_.toSeq).toSeq ===
        expected.toSeq)
      // schema (names + types) is exactly what the un-rewritten
      // aggregate declares
      assert(q.schema.map(f => (f.name, f.dataType.sql)) ===
        Seq("k" -> "STRING", "sv" -> "BIGINT", "n" -> "BIGINT",
          "mn" -> "BIGINT", "mx" -> "BIGINT", "ax" -> "DOUBLE"))
    } finally MvRewrite.deregister(mv)
  }

  test("source commit un-arms the rewrite until re-registration") {
    MvRewrite.install(spark)
    val (src, mv) = fixture()
    try {
      src.append(Seq(("b", 100L, 9.0)).toDF("k", "v", "x"))
      val q1 = query(src)
      assert(scannedPaths(q1).forall(_.contains("/src/")),
        "stale MV must not serve the query")
      // the fallback sees the new row
      assert(q1.filter($"k" === "b").select("sv").as[Long].head() === 105L)
      refresh(src, mv) // incremental refresh + re-register re-arms
      val q2 = query(src)
      assert(scannedPaths(q2).forall(_.contains("/mv/")))
      assert(q2.filter($"k" === "b").select("sv").as[Long].head() === 105L)
    } finally MvRewrite.deregister(mv)
  }

  test("non-matching shapes are left untouched") {
    MvRewrite.install(spark)
    val (src, mv) = fixture()
    try {
      // a filter on a NON-group column → no rewrite (it changes the
      // per-group row set, which the MV cannot re-derive)
      val f = src.read.filter($"v" > 6).groupBy("k").agg(sum("v").as("sv"))
      assert(scannedPaths(f).forall(_.contains("/src/")))
      assert(f.orderBy("k").as[(String, Long)].collect().toSeq ===
        Seq(("a", 30L), ("c", 7L)))
      // grouping by a SUPERSET of the MV's group columns → no rewrite
      val g = src.read.groupBy("k", "v").agg(count(lit(1)))
      assert(scannedPaths(g).forall(_.contains("/src/")))
      // distinct aggregate → no rewrite
      val d = src.read.groupBy("k").agg(countDistinct("v"))
      assert(scannedPaths(d).forall(_.contains("/src/")))
      // an aggregate the MV lacks → no rewrite
      val m = src.read.groupBy("k").agg(min("x"))
      assert(scannedPaths(m).forall(_.contains("/src/")))
      // expression-valued agg input → no rewrite
      val e = src.read.groupBy("k").agg(sum($"v" * 2))
      assert(scannedPaths(e).forall(_.contains("/src/")))
      // count(NULL) is 0 per group, NOT the row count — must not be
      // served from the MV's count(*) column
      val cn = src.read.groupBy("k")
        .agg(count(lit(null).cast("int")).as("n"))
      assert(scannedPaths(cn).forall(_.contains("/src/")))
      assert(cn.select("n").as[Long].collect().toSet === Set(0L))
    } finally MvRewrite.deregister(mv)
  }

  test("rollup: grouping by a subset of the MV's group columns " +
    "re-aggregates the MV") {
    MvRewrite.install(spark)
    val root = tmpDir("graft-mvrw-")
    val src = new VersionedTable(spark, s"$root/src")
    val mv = new VersionedTable(spark, s"$root/mv")
    src.append(Seq(("a", "x", 10L), ("a", "y", 20L), ("b", "x", 5L),
      ("b", "x", 3L)).toDF("k1", "k2", "v"))
    mv.overwrite(src.read.groupBy("k1", "k2").agg(
      sum("v").as("sum_v"), count(lit(1)).as("cnt"),
      min("v").as("min_v"), max("v").as("max_v"), count("v").as("cnt_v")))
    MvRewrite.register(src, mv, Seq("k1", "k2"), Seq(
      MvRewrite.AggSpec("sum", "v", "sum_v"),
      MvRewrite.AggSpec("count", "*", "cnt"),
      MvRewrite.AggSpec("min", "v", "min_v"),
      MvRewrite.AggSpec("max", "v", "max_v"),
      MvRewrite.AggSpec("count", "v", "cnt_v")))
    try {
      val q = src.read.groupBy("k1").agg(sum("v").as("sv"),
        count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"),
        avg("v").as("ax"))
      assert(scannedPaths(q).forall(_.contains("/mv/")),
        "subset grouping must be served by re-aggregating the MV")
      assert(q.orderBy("k1").collect().map(_.toSeq).toSeq === Seq(
        Seq("a", 30L, 2L, 10L, 20L, 15.0),
        Seq("b", 8L, 2L, 3L, 5L, 4.0)))
      // global aggregate (no grouping) is the extreme rollup
      val g = src.read.agg(sum("v").as("sv"), count(lit(1)).as("n"))
      assert(scannedPaths(g).forall(_.contains("/mv/")))
      assert(g.as[(Long, Long)].head() === ((38L, 4L)))
    } finally MvRewrite.deregister(mv)
  }

  test("filters on group columns rewrite onto the MV; rollup composes") {
    MvRewrite.install(spark)
    val root = tmpDir("graft-mvrw-")
    val src = new VersionedTable(spark, s"$root/src")
    val mv = new VersionedTable(spark, s"$root/mv")
    src.append(Seq(("a", "x", 10L), ("a", "y", 20L), ("b", "x", 5L),
      ("c", "y", 2L)).toDF("k1", "k2", "v"))
    mv.overwrite(src.read.groupBy("k1", "k2").agg(
      sum("v").as("sum_v"), count(lit(1)).as("cnt")))
    MvRewrite.register(src, mv, Seq("k1", "k2"), Seq(
      MvRewrite.AggSpec("sum", "v", "sum_v"),
      MvRewrite.AggSpec("count", "*", "cnt")))
    try {
      // exact grouping + group-col filter
      val q = src.read.filter($"k1" =!= "c").groupBy("k1", "k2")
        .agg(sum("v").as("sv"))
      assert(scannedPaths(q).forall(_.contains("/mv/")))
      assert(q.orderBy("k1", "k2").as[(String, String, Long)]
        .collect().toSeq ===
        Seq(("a", "x", 10L), ("a", "y", 20L), ("b", "x", 5L)))
      // rollup + filter on a group column the output does not keep
      val r = src.read.filter($"k2" === "x").groupBy("k1")
        .agg(sum("v").as("sv"), count(lit(1)).as("n"))
      assert(scannedPaths(r).forall(_.contains("/mv/")))
      assert(r.orderBy("k1").as[(String, Long, Long)].collect().toSeq ===
        Seq(("a", 10L, 1L), ("b", 5L, 1L)))
    } finally MvRewrite.deregister(mv)
  }

  test("avg derives sum/count with NULL-group and null-skip semantics") {
    MvRewrite.install(spark)
    val root = tmpDir("graft-mvrw-")
    val src = new VersionedTable(spark, s"$root/src")
    val mv = new VersionedTable(spark, s"$root/mv")
    // group b: one null x — avg must divide by count(x)=1, not count(*)=2;
    // group c: all-null x — avg must stay NULL
    src.append(Seq(("a", Some(2.0)), ("a", Some(4.0)), ("b", Some(6.0)),
      ("b", None), ("c", None)).toDF("k", "x"))
    mv.overwrite(src.read.groupBy("k").agg(
      sum("x").as("sum_x"), count("x").as("cnt_x")))
    MvRewrite.register(src, mv, Seq("k"), Seq(
      MvRewrite.AggSpec("sum", "x", "sum_x"),
      MvRewrite.AggSpec("count", "x", "cnt_x")))
    try {
      val q = src.read.groupBy("k").agg(avg("x").as("ax"))
      assert(scannedPaths(q).forall(_.contains("/mv/")))
      assert(q.orderBy("k").as[(String, Option[Double])].collect().toSeq ===
        Seq(("a", Some(3.0)), ("b", Some(6.0)), ("c", None)))
    } finally MvRewrite.deregister(mv)
  }

  test("library-path Catalog.dropTable un-arms routing — no stale entry " +
       "serves from the deleted MV path") {
    MvRewrite.install(spark)
    val wh = tmpDir("graft-mvrw-cat-")
    val cat = new graft.tables.Catalog(spark, wh)
    cat.bootstrap()
    val src = cat.table("silver", "mvsrc")
    val mv = cat.table("gold", "mvtab")
    src.append(Seq(("a", 1L), ("a", 3L), ("b", 2L)).toDF("k", "v"))
    mv.overwrite(src.read.groupBy("k").agg(
      sum("v").as("sum_v"), count(lit(1)).as("cnt")))
    MvRewrite.register(src, mv, Seq("k"), Seq(
      MvRewrite.AggSpec("sum", "v", "sum_v"),
      MvRewrite.AggSpec("count", "*", "cnt")))
    def q(): DataFrame = src.read.groupBy("k").agg(sum("v").as("sv"))
    assert(scannedPaths(q()).forall(_.contains("/gold/mvtab")),
      "routing should be armed before the drop")
    // drop THROUGH THE LIBRARY CATALOG, not the SQL funnel — the guard
    // must live in Catalog.dropTable itself
    cat.dropTable("gold", "mvtab")
    // the same query now falls back to the (live) source instead of
    // failing at read over the deleted MV directory
    val after = q()
    assert(scannedPaths(after).forall(_.contains("/silver/mvsrc")),
      s"expected source fallback, got ${scannedPaths(after)}")
    assert(after.orderBy("k").as[(String, Long)].collect().toSeq ===
      Seq(("a", 4L), ("b", 2L)))
  }
}
