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

  // ------------------------------------------------------- join-shaped MVs

  /** Fact ⋈ dim rollup fixture: fact rows with an unmatched team (t=9,
    * dropped by the inner join) and a NULL key (never matches). */
  private def joinFixture(): (VersionedTable, VersionedTable, VersionedTable) = {
    val root = tmpDir("graft-mvjoin-")
    val fact = new VersionedTable(spark, s"$root/fact")
    val dim = new VersionedTable(spark, s"$root/dim")
    val mv = new VersionedTable(spark, s"$root/mv")
    fact.append(Seq(
      (java.lang.Integer.valueOf(1), "p1", 10L),
      (java.lang.Integer.valueOf(1), "p2", 20L),
      (java.lang.Integer.valueOf(2), "p3", 5L),
      (java.lang.Integer.valueOf(9), "p4", 7L),
      (null.asInstanceOf[java.lang.Integer], "p5", 100L))
      .toDF("t", "player", "v"))
    dim.append(Seq((1, "red"), (2, "blue"), (3, "green"))
      .toDF("t", "color"))
    refreshJoin(fact, dim, mv)
    (fact, dim, mv)
  }

  private def refreshJoin(fact: VersionedTable, dim: VersionedTable,
                          mv: VersionedTable): Unit = {
    val f = fact.read; val d = dim.read
    mv.overwrite(f.join(d, f("t") === d("t"))
      .groupBy(d("color"))
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt")))
    MvRewrite.registerJoin(fact, dim, Seq(("t", "t")), mv,
      Seq("color"), Seq(
        MvRewrite.AggSpec("sum", "v", "sum_v"),
        MvRewrite.AggSpec("count", "*", "cnt")))
  }

  private def joinQuery(fact: VersionedTable, dim: VersionedTable): DataFrame = {
    val f = fact.read; val d = dim.read
    f.join(d, f("t") === d("t")).groupBy(d("color"))
      .agg(sum("v").as("sv"), count(lit(1)).as("n"))
  }

  test("join MV: the fact-join-dim rollup routes to the MV, values " +
       "identical incl. unmatched and NULL-key fact rows") {
    MvRewrite.install(spark)
    val (fact, dim, mv) = joinFixture()
    try {
      val q = joinQuery(fact, dim)
      val paths = scannedPaths(q)
      assert(paths.nonEmpty && paths.forall(_.contains("/mv/")),
        s"expected MV-only scan, got $paths")
      assert(q.orderBy("color").as[(String, Long, Long)].collect().toSeq ===
        Seq(("blue", 5L, 1L), ("red", 30L, 2L)))
    } finally MvRewrite.deregister(mv)
  }

  test("join MV: swapped side order still serves (inner joins commute)") {
    MvRewrite.install(spark)
    val (fact, dim, mv) = joinFixture()
    try {
      val f = fact.read; val d = dim.read
      val q = d.join(f, d("t") === f("t")).groupBy(d("color"))
        .agg(sum("v").as("sv"))
      assert(scannedPaths(q).forall(_.contains("/mv/")),
        s"swapped sides must still route, got ${scannedPaths(q)}")
      assert(q.orderBy("color").as[(String, Long)].collect().toSeq ===
        Seq(("blue", 5L), ("red", 30L)))
    } finally MvRewrite.deregister(mv)
  }

  test("join MV: a commit to EITHER side un-arms until re-registration") {
    MvRewrite.install(spark)
    val (fact, dim, mv) = joinFixture()
    try {
      fact.append(Seq((java.lang.Integer.valueOf(2), "p6", 50L))
        .toDF("t", "player", "v"))
      val q1 = joinQuery(fact, dim)
      assert(!scannedPaths(q1).exists(_.contains("/mv/")),
        "stale-on-fact MV must not serve")
      assert(q1.filter($"color" === "blue").select("sv").as[Long].head()
        === 55L)
      refreshJoin(fact, dim, mv) // re-materialize + re-arm
      assert(scannedPaths(joinQuery(fact, dim)).forall(_.contains("/mv/")))
      dim.append(Seq((4, "cyan")).toDF("t", "color"))
      val q2 = joinQuery(fact, dim)
      assert(!scannedPaths(q2).exists(_.contains("/mv/")),
        "stale-on-dim MV must not serve")
    } finally MvRewrite.deregister(mv)
  }

  test("join MV: global rollup and group-column filters rewrite; a " +
       "non-group filter falls back") {
    MvRewrite.install(spark)
    val (fact, dim, mv) = joinFixture()
    try {
      val f = fact.read; val d = dim.read
      // global aggregate re-aggregates the MV (strict subset of groups)
      val g = f.join(d, f("t") === d("t")).agg(sum("v").as("sv"))
      assert(scannedPaths(g).forall(_.contains("/mv/")))
      assert(g.as[Long].head() === 35L)
      // filter on the group column rewrites onto the MV
      val fq = f.join(d, f("t") === d("t"))
        .filter(d("color") === "red")
        .groupBy(d("color")).agg(sum("v").as("sv"))
      assert(scannedPaths(fq).forall(_.contains("/mv/")),
        s"group-filter must route, got ${scannedPaths(fq)}")
      assert(fq.as[(String, Long)].head() === (("red", 30L)))
      // filter on a non-group fact column cannot serve from the MV
      val nf = f.join(d, f("t") === d("t"))
        .filter(f("player") =!= "p1")
        .groupBy(d("color")).agg(sum("v").as("sv"))
      assert(!scannedPaths(nf).exists(_.contains("/mv/")),
        "non-group filter must fall back to the sources")
      assert(nf.orderBy("color").as[(String, Long)].collect().toSeq ===
        Seq(("blue", 5L), ("red", 20L)))
    } finally MvRewrite.deregister(mv)
  }

  test("join MV: outer joins and extra join conjuncts never route") {
    MvRewrite.install(spark)
    val (fact, dim, mv) = joinFixture()
    try {
      val f = fact.read; val d = dim.read
      val lj = f.join(d, f("t") === d("t"), "left")
        .groupBy(d("color")).agg(sum("v").as("sv"))
      assert(!scannedPaths(lj).exists(_.contains("/mv/")),
        "left join must not serve from an inner-join MV")
      val rangeJ = f.join(d, f("t") === d("t") && f("v") > d("t"))
        .groupBy(d("color")).agg(sum("v").as("sv"))
      assert(!scannedPaths(rangeJ).exists(_.contains("/mv/")),
        "non-equi conjunct must not serve")
    } finally MvRewrite.deregister(mv)
  }

  test("join MV: registration refuses ambiguous column names") {
    val root = tmpDir("graft-mvjoin-amb-")
    val l = new VersionedTable(spark, s"$root/l")
    val r = new VersionedTable(spark, s"$root/r")
    val mv = new VersionedTable(spark, s"$root/mv")
    l.append(Seq((1, 10L)).toDF("t", "v"))
    r.append(Seq((1, 20L)).toDF("t", "v")) // v on BOTH sides
    mv.overwrite(Seq((1, 10L)).toDF("t", "sum_v"))
    val e = intercept[IllegalArgumentException](
      MvRewrite.registerJoin(l, r, Seq(("t", "t")), mv, Seq("t"),
        Seq(MvRewrite.AggSpec("sum", "v", "sum_v"))))
    assert(e.getMessage.contains("ambiguous"))
  }
}
