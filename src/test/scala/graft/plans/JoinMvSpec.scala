package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.VersionedTable

/** Join-MV lifecycle ([[JoinMv]]): create → route → incremental
  * maintenance from the fact CDF → re-arm; every maintained state must
  * equal the from-scratch recompute. */
class JoinMvSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(aggs: Seq[MvRewrite.AggSpec])
      : (VersionedTable, VersionedTable, VersionedTable) = {
    val root = tmpDir("graft-jmv-")
    val fact = new VersionedTable(spark, s"$root/fact")
    val dim = new VersionedTable(spark, s"$root/dim")
    val mv = new VersionedTable(spark, s"$root/mv")
    fact.enableChangeFeed()
    fact.append(Seq((1, "p1", 10L), (1, "p2", 20L), (2, "p3", 5L),
      (3, "p4", 7L), (9, "p9", 99L)).toDF("t", "player", "v"))
    dim.append(Seq((1, "red"), (2, "blue"), (3, "red")).toDF("t", "color"))
    JoinMv.create(fact, dim, Seq(("t", "t")), Seq("color"), aggs, mv)
    (fact, dim, mv)
  }

  private val sumAggs = Seq(
    MvRewrite.AggSpec("sum", "v", "sum_v"),
    MvRewrite.AggSpec("count", "v", "cnt_v"),
    MvRewrite.AggSpec("count", "*", "cnt"))

  private def recomputed(fact: VersionedTable, dim: VersionedTable): DataFrame = {
    val f = fact.read; val d = dim.read
    f.join(d, f("t") === d("t")).groupBy(d("color"))
      .agg(sum("v").as("sum_v"), count("v").as("cnt_v"),
        count(lit(1)).as("cnt"))
  }

  private def mvRows(mv: VersionedTable): Seq[(String, Option[Long], Long, Long)] =
    mv.read.select("color", "sum_v", "cnt_v", "cnt")
      .as[(String, Option[Long], Long, Long)].collect().toSeq.sortBy(_._1)

  test("create arms routing; refresh with no source movement is a noop") {
    MvRewrite.install(spark)
    val (fact, dim, mv) = fixture(sumAggs)
    try {
      val f = fact.read; val d = dim.read
      val q = f.join(d, f("t") === d("t")).groupBy(d("color"))
        .agg(sum("v").as("sv"))
      assert(MvRewrite.scannedPaths(q).forall(_.contains("/mv/")))
      assert(q.orderBy("color").as[(String, Long)].collect().toSeq ===
        Seq(("blue", 5L), ("red", 37L)))
      assert(JoinMv.refresh(spark, mv) === "noop")
      assert(MvRewrite.scannedPaths(q).forall(_.contains("/mv/")),
        "noop refresh must keep routing armed")
    } finally MvRewrite.deregister(mv)
  }

  test("fact mutations absorb as signed CDF deltas; the maintained MV " +
       "equals the recompute and routing serves the new snapshot") {
    MvRewrite.install(spark)
    val (fact, dim, mv) = fixture(sumAggs)
    try {
      val mvV0 = mv.latestVersion.get
      fact.append(Seq((2, "p5", 50L), (1, "p6", 1L)).toDF("t", "player", "v"))
      fact.update(Map("v" -> lit(100L)), col("player") === "p1")
      fact.delete(col("player") === "p3")
      assert(JoinMv.refresh(spark, mv) === "cdf")
      val want = recomputed(fact, dim).as[(String, Option[Long], Long, Long)]
        .collect().toSeq.sortBy(_._1)
      assert(mvRows(mv) === want)
      // maintenance was a delta merge, not an overwrite
      assert(mv.history.count(_.action == "overwrite") === 1,
        "cdf refresh must never rewrite the whole MV")
      val q = recomputed(fact, dim)
      assert(MvRewrite.scannedPaths(q).forall(_.contains("/mv/")),
        "refresh must re-arm routing at the new fact snapshot")
      assert(mv.latestVersion.get > mvV0)
    } finally MvRewrite.deregister(mv)
  }

  test("deleting a group's last fact rows drops the MV row, exactly " +
       "like a recompute") {
    MvRewrite.install(spark)
    val (fact, dim, mv) = fixture(sumAggs)
    try {
      fact.delete(col("t") === 2) // blue's only fact row
      assert(JoinMv.refresh(spark, mv) === "cdf")
      assert(mvRows(mv).map(_._1) === Seq("red"))
    } finally MvRewrite.deregister(mv)
  }

  test("min/max aggs maintain per-touched-group: untouched MV rows are " +
       "carried, vanished groups delete") {
    MvRewrite.install(spark)
    val aggs = sumAggs :+ MvRewrite.AggSpec("max", "v", "max_v")
    val (fact, dim, mv) = fixture(aggs)
    try {
      // touch blue only (lower its max); red must be carried untouched
      fact.update(Map("v" -> lit(2L)), col("player") === "p3")
      assert(JoinMv.refresh(spark, mv) === "groups")
      val f = fact.read; val d = dim.read
      val want = f.join(d, f("t") === d("t")).groupBy(d("color"))
        .agg(sum("v").as("sum_v"), count("v").as("cnt_v"),
          count(lit(1)).as("cnt"), max("v").as("max_v"))
        .orderBy("color").collect().map(_.toSeq).toSeq
      assert(mv.read.select("color", "sum_v", "cnt_v", "cnt", "max_v")
        .orderBy("color").collect().map(_.toSeq).toSeq === want)
      // vanish blue entirely
      fact.delete(col("t") === 2)
      assert(JoinMv.refresh(spark, mv) === "groups")
      assert(mv.read.select("color").as[String].collect().toSeq === Seq("red"))
    } finally MvRewrite.deregister(mv)
  }

  test("a dim commit forces full re-materialization and re-arms") {
    MvRewrite.install(spark)
    val (fact, dim, mv) = fixture(sumAggs)
    try {
      dim.append(Seq((9, "green")).toDF("t", "color")) // t=9 now matches
      assert(JoinMv.refresh(spark, mv) === "full")
      assert(mvRows(mv).map(r => (r._1, r._2.get)) ===
        Seq(("blue", 5L), ("green", 99L), ("red", 37L)))
      val q = recomputed(fact, dim)
      assert(MvRewrite.scannedPaths(q).forall(_.contains("/mv/")))
    } finally MvRewrite.deregister(mv)
  }

  test("crash replay: a stale covered-version property re-applies the " +
       "slice as a txn no-op, never double-counting") {
    MvRewrite.install(spark)
    val (fact, dim, mv) = fixture(sumAggs)
    try {
      val coveredBefore = mv.properties(JoinMv.FactVersionProp)
      fact.append(Seq((1, "p7", 7L)).toDF("t", "player", "v"))
      assert(JoinMv.refresh(spark, mv) === "cdf")
      val rows = mvRows(mv)
      val mvV = mv.latestVersion.get
      // simulate the crash window: merge committed, property bump lost
      mv.setProperties(Map(JoinMv.FactVersionProp -> coveredBefore))
      assert(JoinMv.refresh(spark, mv) === "noop",
        "ledger resume must see the slice as already absorbed")
      assert(mvRows(mv) === rows)
      assert(mv.latestVersion.get === mvV, "replay must be metadata-only")
    } finally MvRewrite.deregister(mv)
  }

  test("arm() re-arms routing from the durable definition after a " +
       "registry wipe (process restart)") {
    MvRewrite.install(spark)
    val (fact, dim, mv) = fixture(sumAggs)
    try {
      MvRewrite.deregister(mv) // the in-memory registry dies with the JVM
      val q = recomputed(fact, dim)
      assert(!MvRewrite.scannedPaths(q).exists(_.contains("/mv/")))
      JoinMv.arm(spark, mv)
      assert(MvRewrite.scannedPaths(recomputed(fact, dim))
        .forall(_.contains("/mv/")))
    } finally MvRewrite.deregister(mv)
  }

  test("metadata-only DDL commits are absorbless: a dim rename of an " +
       "unreferenced column must not trigger an O(fact) rebuild") {
    MvRewrite.install(spark)
    val (fact, dim, mv) = fixture(sumAggs)
    try {
      dim.addColumns("note STRING")
      assert(JoinMv.refresh(spark, mv) === "full") // add = (empty) append
      dim.renameColumn("note", "comment")
      assert(JoinMv.refresh(spark, mv) === "noop",
        "a dim RENAME COLUMN is metadata-only — rebuilding the whole " +
          "fact join for it is the bug this pins")
      // and interleaved with fact data commits, the CDF path survives
      fact.append(Seq((2, "p5", 11L)).toDF("t", "player", "v"))
      fact.renameColumn("player", "athlete")
      assert(JoinMv.refresh(spark, mv) === "cdf")
      assert(mvRows(mv).find(_._1 == "blue").map(_._2) ===
        Some(Some(16L)))
    } finally MvRewrite.deregister(mv)
  }
}
