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

  test("dim mutations absorb as signed CDF deltas when the dim feed is " +
       "on: no O(MV) rebuild, result equals the recompute") {
    MvRewrite.install(spark)
    val root = tmpDir("graft-jmv-dd-")
    val fact = new VersionedTable(spark, s"$root/fact")
    val dim = new VersionedTable(spark, s"$root/dim")
    val mv = new VersionedTable(spark, s"$root/mv")
    fact.enableChangeFeed(); dim.enableChangeFeed()
    fact.append(Seq((1, "p1", 10L), (1, "p2", 20L), (2, "p3", 5L),
      (3, "p4", 7L), (9, "p9", 99L)).toDF("t", "player", "v"))
    dim.append(Seq((1, "red"), (2, "blue"), (3, "red")).toDF("t", "color"))
    JoinMv.create(fact, dim, Seq(("t", "t")), Seq("color"), sumAggs, mv)
    try {
      // dim UPDATE moves team 3 red→blue, dim APPEND matches t=9, dim
      // DELETE drops team 2 — three dim-side change shapes in one slice
      dim.update(Map("color" -> lit("blue")), col("t") === 3)
      dim.append(Seq((9, "green")).toDF("t", "color"))
      dim.delete(col("t") === 2)
      assert(JoinMv.refresh(spark, mv) === "cdf-dims")
      assert(mvRows(mv) === recomputed(fact, dim)
        .as[(String, Option[Long], Long, Long)].collect().toSeq.sortBy(_._1))
      assert(mv.history.count(_.action == "overwrite") === 1,
        "a dim change must merge a delta, never rewrite the whole MV")
      // and the maintained MV keeps serving rewrites at the new pins
      val q = recomputed(fact, dim)
      assert(MvRewrite.scannedPaths(q).forall(_.contains("/mv/")))
    } finally MvRewrite.deregister(mv)
  }

  test("fact and dim moving in the same refresh window telescope: one " +
       "slice per side, composed result equals the recompute") {
    MvRewrite.install(spark)
    val root = tmpDir("graft-jmv-fd-")
    val fact = new VersionedTable(spark, s"$root/fact")
    val dim = new VersionedTable(spark, s"$root/dim")
    val mv = new VersionedTable(spark, s"$root/mv")
    fact.enableChangeFeed(); dim.enableChangeFeed()
    fact.append(Seq((1, "p1", 10L), (2, "p3", 5L), (3, "p4", 7L))
      .toDF("t", "player", "v"))
    dim.append(Seq((1, "red"), (2, "blue"), (3, "red")).toDF("t", "color"))
    JoinMv.create(fact, dim, Seq(("t", "t")), Seq("color"), sumAggs, mv)
    try {
      fact.append(Seq((2, "p5", 50L), (1, "p6", 1L)).toDF("t", "player", "v"))
      fact.delete(col("player") === "p1")
      dim.update(Map("color" -> lit("gold")), col("t") === 1)
      assert(JoinMv.refresh(spark, mv) === "cdf-dims")
      assert(mvRows(mv) === recomputed(fact, dim)
        .as[(String, Option[Long], Long, Long)].collect().toSeq.sortBy(_._1))
      assert(mv.history.count(_.action == "overwrite") === 1)
      // converged: the next refresh sees nothing new
      assert(JoinMv.refresh(spark, mv) === "noop")
    } finally MvRewrite.deregister(mv)
  }

  test("a dim change slice ABOVE the broadcast row cap falls back to an " +
       "unhinted (shuffle-able) join — same maintained state, no forced " +
       "broadcast of an unbounded slice") {
    // The explicit broadcast of the dim's CDF slice is gated on a
    // bounded row probe (an SCD2 full-dim rewrite churns EVERY row —
    // unbounded — and an unconditional hint would drive that into the
    // 8GB-broadcast / driver-memory ceiling). This pins the over-cap
    // path's CORRECTNESS: scope the cap below the slice size and the
    // refresh must still maintain incrementally and converge.
    MvRewrite.install(spark)
    val root = tmpDir("graft-jmv-cap-")
    val fact = new VersionedTable(spark, s"$root/fact")
    val dim = new VersionedTable(spark, s"$root/dim")
    val mv = new VersionedTable(spark, s"$root/mv")
    fact.enableChangeFeed(); dim.enableChangeFeed()
    fact.append(Seq((1, "p1", 10L), (1, "p2", 20L), (2, "p3", 5L),
      (3, "p4", 7L)).toDF("t", "player", "v"))
    dim.append(Seq((1, "red"), (2, "blue"), (3, "red")).toDF("t", "color"))
    JoinMv.create(fact, dim, Seq(("t", "t")), Seq("color"), sumAggs, mv)
    val prevCap = JoinMv.BroadcastSliceRowCap
    JoinMv.BroadcastSliceRowCap = 1 // every real slice is now "too big"
    try {
      // full-dim rewrite: every row churns (the exact shape the cap
      // exists for) — slice = 3 update pre/post pairs > cap
      dim.update(Map("color" -> lit("gold")), lit(true))
      assert(JoinMv.refresh(spark, mv) === "cdf-dims",
        "over-cap slices must still maintain incrementally, not rebuild")
      assert(mvRows(mv) === recomputed(fact, dim)
        .as[(String, Option[Long], Long, Long)].collect().toSeq.sortBy(_._1))
      assert(mv.history.count(_.action == "overwrite") === 1,
        "the fallback is a join-strategy change, never a recompute")
      assert(JoinMv.refresh(spark, mv) === "noop")
    } finally {
      JoinMv.BroadcastSliceRowCap = prevCap
      MvRewrite.deregister(mv)
    }
  }

  test("SCD2 dim composes through the is_current filter: closing a " +
       "version retracts it, the MV tracks the current-rows join " +
       "without a rebuild, and routing never arms for filtered dims") {
    MvRewrite.install(spark)
    val root = tmpDir("graft-jmv-scd-")
    val fact = new VersionedTable(spark, s"$root/fact")
    val dim = new VersionedTable(spark, s"$root/dim")
    val mv = new VersionedTable(spark, s"$root/mv")
    fact.enableChangeFeed(); dim.enableChangeFeed()
    fact.append(Seq((1, "p1", 10L), (1, "p2", 20L), (2, "p3", 5L),
      (3, "p4", 7L)).toDF("t", "player", "v"))
    graft.ops.Scd2.applyBatchToTable(dim,
      Seq((1, "red"), (2, "blue"), (3, "red")).toDF("t", "color"),
      keys = Seq("t"), tracked = Seq("color"),
      batchTs = lit("2026-01-01 00:00:00"))
    JoinMv.create(fact,
      Seq(JoinMv.DimSide(dim, Seq(("t", "t")), Some("is_current"))),
      Seq("color"), sumAggs, mv)
    try {
      def currentJoin: DataFrame = {
        val f = fact.read; val d = dim.read.filter(col("is_current"))
        f.join(d, f("t") === d("t")).groupBy(d("color"))
          .agg(sum("v").as("sum_v"), count("v").as("cnt_v"),
            count(lit(1)).as("cnt"))
      }
      assert(mvRows(mv) === currentJoin
        .as[(String, Option[Long], Long, Long)].collect().toSeq.sortBy(_._1))
      // SCD2 batch: team 1 changes color (close + open), team 9 is new
      // (no fact match). The closed red version must RETRACT from the
      // MV even though its row still exists in the dim table.
      graft.ops.Scd2.applyBatchToTable(dim,
        Seq((1, "gold"), (9, "green")).toDF("t", "color"),
        keys = Seq("t"), tracked = Seq("color"),
        batchTs = lit("2026-02-01 00:00:00"))
      assert(JoinMv.refresh(spark, mv) === "cdf-dims")
      assert(mvRows(mv) === currentJoin
        .as[(String, Option[Long], Long, Long)].collect().toSeq.sortBy(_._1))
      assert(mvRows(mv).map(_._1) === Seq("blue", "gold", "red"),
        "team 1's fact rows must now roll up under gold, not red")
      assert(mv.history.count(_.action == "overwrite") === 1,
        "an SCD2 dim batch must never trigger an O(MV) rebuild")
      // filtered definitions must not serve the unfiltered join
      val f = fact.read; val d = dim.read
      val unfiltered = f.join(d, f("t") === d("t")).groupBy(d("color"))
        .agg(sum("v").as("sum_v"))
      assert(!MvRewrite.scannedPaths(unfiltered).exists(_.contains("/mv/")),
        "a query over ALL dim versions must not read the current-rows MV")
      // durable: a fresh definition parse (restart) keeps maintaining
      graft.ops.Scd2.applyBatchToTable(dim,
        Seq((2, "black")).toDF("t", "color"),
        keys = Seq("t"), tracked = Seq("color"),
        batchTs = lit("2026-03-01 00:00:00"))
      assert(JoinMv.refresh(spark, mv) === "cdf-dims")
      assert(mvRows(mv) === currentJoin
        .as[(String, Option[Long], Long, Long)].collect().toSeq.sortBy(_._1))
    } finally MvRewrite.deregister(mv)
  }

  test("star schema under churn on EVERY side at once: fact + both dims " +
       "(one filtered) telescope to the recompute, one merge per side") {
    MvRewrite.install(spark)
    val root = tmpDir("graft-jmv-star2-")
    val fact = new VersionedTable(spark, s"$root/fact")
    val d1 = new VersionedTable(spark, s"$root/d1")
    val d2 = new VersionedTable(spark, s"$root/d2")
    val mv = new VersionedTable(spark, s"$root/mv")
    fact.enableChangeFeed(); d1.enableChangeFeed(); d2.enableChangeFeed()
    fact.append(Seq((1, 10, 5L), (1, 20, 7L), (2, 10, 11L), (3, 20, 13L))
      .toDF("t", "r", "v"))
    d1.append(Seq((1, "red", true), (1, "old-red", false), (2, "blue", true),
      (3, "red", true)).toDF("t", "color", "cur"))
    d2.append(Seq((10, "eu"), (20, "us")).toDF("r", "zone"))
    JoinMv.create(fact, Seq(
        JoinMv.DimSide(d1, Seq(("t", "t")), Some("cur")),
        JoinMv.DimSide(d2, Seq(("r", "r")))),
      Seq("color", "zone"), sumAggs, mv)
    def want(): Seq[Seq[Any]] = {
      val f = fact.read; val a = d1.read.filter(col("cur")); val b = d2.read
      f.join(a, f("t") === a("t")).join(b, f("r") === b("r"))
        .groupBy(a("color"), b("zone"))
        .agg(sum("v").as("sum_v"), count("v").as("cnt_v"),
          count(lit(1)).as("cnt"))
        .orderBy("color", "zone").collect().map(_.toSeq).toSeq
    }
    def got(): Seq[Seq[Any]] =
      mv.read.select("color", "zone", "sum_v", "cnt_v", "cnt")
        .orderBy("color", "zone").collect().map(_.toSeq).toSeq
    try {
      assert(got() === want())
      // one refresh window where EVERYTHING moves:
      fact.append(Seq((2, 20, 17L)).toDF("t", "r", "v"))
      fact.delete(col("v") === 7L)
      d1.update(Map("cur" -> lit(false)), col("t") === 3 && col("cur"))
      d1.append(Seq((3, "gold", true)).toDF("t", "color", "cur"))
      d2.update(Map("zone" -> lit("apac")), col("r") === 10)
      assert(JoinMv.refresh(spark, mv) === "cdf-dims")
      assert(got() === want())
      assert(mv.history.count(_.action == "overwrite") === 1)
      // and again, dims only
      d1.update(Map("cur" -> lit(false)), col("t") === 2 && col("cur"))
      assert(JoinMv.refresh(spark, mv) === "cdf-dims")
      assert(got() === want())
      assert(JoinMv.refresh(spark, mv) === "noop")
    } finally MvRewrite.deregister(mv)
  }

  test("a BUCKETED fact's dim slice reads only the changed keys' " +
       "buckets (bounded key collect), result equals the recompute") {
    MvRewrite.install(spark)
    val root = tmpDir("graft-jmv-bf-")
    val fact = new VersionedTable(spark, s"$root/fact")
    val dim = new VersionedTable(spark, s"$root/dim")
    val mv = new VersionedTable(spark, s"$root/mv")
    fact.enableChangeFeed(); dim.enableChangeFeed()
    // merge-bucketed fact on the JOIN key — the dim-slice bucket-prune
    // precondition
    fact.merge((0 until 64).map(i => (i % 8, i.toLong, i.toLong * 3))
      .toDF("t", "fid", "v"), Seq("fid"), numBuckets = 8)
    // note: bucketed on fid, NOT the join key → full-scan fallback path
    dim.append((0 until 8).map(i => (i, if (i % 2 == 0) "red" else "blue"))
      .toDF("t", "color"))
    JoinMv.create(fact, dim, Seq(("t", "t")), Seq("color"), sumAggs, mv)
    try {
      dim.update(Map("color" -> lit("gold")), col("t") === 3)
      assert(JoinMv.refresh(spark, mv) === "cdf-dims")
      assert(mvRows(mv) === recomputed(fact, dim)
        .as[(String, Option[Long], Long, Long)].collect().toSeq.sortBy(_._1))
    } finally MvRewrite.deregister(mv)
    // and the PRUNED path: fact bucketed on the join key itself
    val root2 = tmpDir("graft-jmv-bf2-")
    val fact2 = new VersionedTable(spark, s"$root2/fact")
    val dim2 = new VersionedTable(spark, s"$root2/dim")
    val mv2 = new VersionedTable(spark, s"$root2/mv")
    fact2.enableChangeFeed(); dim2.enableChangeFeed()
    fact2.merge((0 until 64).map(i => (i % 8, i.toLong * 3))
      .toDF("t", "v"), Seq("t"), numBuckets = 8)
    dim2.append((0 until 8).map(i => (i, if (i % 2 == 0) "red" else "blue"))
      .toDF("t", "color"))
    JoinMv.create(fact2, dim2, Seq(("t", "t")), Seq("color"), sumAggs, mv2)
    try {
      dim2.update(Map("color" -> lit("gold")), col("t") === 3)
      dim2.delete(col("t") === 6)
      assert(JoinMv.refresh(spark, mv2) === "cdf-dims")
      val f = fact2.read; val d = dim2.read
      val want = f.join(d, f("t") === d("t")).groupBy(d("color"))
        .agg(sum("v").as("sum_v"), count("v").as("cnt_v"),
          count(lit(1)).as("cnt"))
        .as[(String, Option[Long], Long, Long)].collect().toSeq.sortBy(_._1)
      assert(mvRows(mv2) === want)
      assert(mv2.history.count(_.action == "overwrite") === 1)
    } finally MvRewrite.deregister(mv2)
  }

  test("randomized DML churn (seeded): maintained join MV equals the " +
       "recompute after every refresh, across 8 mixed rounds") {
    MvRewrite.install(spark)
    val root = tmpDir("graft-jmv-rand-")
    val fact = new VersionedTable(spark, s"$root/fact")
    val dim = new VersionedTable(spark, s"$root/dim")
    val mv = new VersionedTable(spark, s"$root/mv")
    fact.enableChangeFeed(); dim.enableChangeFeed()
    val rnd = new scala.util.Random(20260815L)
    val colors = Vector("red", "blue", "gold", "green")
    fact.append((0 until 40).map(i => (i % 8, i.toLong))
      .toDF("t", "v"))
    dim.append((0 until 8).map(i => (i, colors(i % colors.length)))
      .toDF("t", "color"))
    JoinMv.create(fact, dim, Seq(("t", "t")), Seq("color"), sumAggs, mv)
    def want(): Seq[Seq[Any]] = {
      val f = fact.read; val d = dim.read
      f.join(d, f("t") === d("t")).groupBy(d("color"))
        .agg(sum("v").as("sum_v"), count("v").as("cnt_v"),
          count(lit(1)).as("cnt"))
        .orderBy("color").collect().map(_.toSeq).toSeq
    }
    def got(): Seq[Seq[Any]] =
      mv.read.select("color", "sum_v", "cnt_v", "cnt")
        .orderBy("color").collect().map(_.toSeq).toSeq
    try {
      var nextV = 1000L
      (1 to 8).foreach { round =>
        // 1-3 random mutations per round, either side
        (0 until (1 + rnd.nextInt(3))).foreach { _ =>
          rnd.nextInt(5) match {
            case 0 =>
              nextV += 1
              fact.append(Seq((rnd.nextInt(8), nextV)).toDF("t", "v"))
              ()
            case 1 =>
              fact.update(Map("v" -> (col("v") + 100L)),
                col("t") === rnd.nextInt(8))
              ()
            case 2 =>
              fact.delete(col("v") % 7 === rnd.nextInt(7).toLong)
              ()
            case 3 =>
              dim.update(Map("color" -> lit(colors(rnd.nextInt(4)))),
                col("t") === rnd.nextInt(8))
              ()
            case 4 =>
              dim.delete(col("t") === rnd.nextInt(8))
              ()
          }
        }
        val mode = JoinMv.refresh(spark, mv)
        assert(Set("cdf", "cdf-dims", "noop")(mode),
          s"round $round must maintain incrementally, got $mode")
        assert(got() === want(), s"divergence after round $round ($mode)")
      }
      assert(mv.history.count(_.action == "overwrite") === 1,
        "8 churn rounds must never trigger a full rebuild")
    } finally MvRewrite.deregister(mv)
  }

  test("a crash BETWEEN slices never double-counts a cross-term: an " +
       "empty fact slice's pin advance is durable before later slices, " +
       "so retries absorb each delta exactly once") {
    MvRewrite.install(spark)
    val root = tmpDir("graft-jmv-xt-")
    val fact = new VersionedTable(spark, s"$root/fact")
    val d1 = new VersionedTable(spark, s"$root/d1")
    val d2 = new VersionedTable(spark, s"$root/d2")
    val mv = new VersionedTable(spark, s"$root/mv")
    fact.enableChangeFeed(); d1.enableChangeFeed(); d2.enableChangeFeed()
    fact.append(Seq((1, 10, 5L)).toDF("t", "r", "v"))
    d1.append(Seq((1, "red")).toDF("t", "color"))
    d2.append(Seq((10, "eu")).toDF("r", "zone"))
    JoinMv.create(fact, Seq(
        JoinMv.DimSide(d1, Seq(("t", "t"))),
        JoinMv.DimSide(d2, Seq(("r", "r")))),
      Seq("color", "zone"), sumAggs, mv)
    try {
      // crash injector: a CHECK on the MV that only d2's slice can trip
      // (it alone introduces an 'apac' group) — the refresh aborts with
      // a non-CdfNotExpressible error exactly between slices, and
      // dropping the constraint later "reboots the process"
      mv.addCheck("no_apac", "zone != 'apac'")
      // the cross-term plant: a fact row whose dim-1 key arrives ONLY
      // in this window's dim delta — ΔF ⋈ D1@old is EMPTY, while
      // ΔF ⋈ D1@new is not. Under a naive resume the replayed fact
      // slice would absorb (t=5, v=50) twice.
      fact.append(Seq((5, 10, 50L)).toDF("t", "r", "v"))
      d1.append(Seq((5, "gold")).toDF("t", "color"))
      d2.append(Seq((10, "apac")).toDF("r", "zone")) // trips the CHECK
      def tryRefresh(): Throwable =
        intercept[Throwable](JoinMv.refresh(spark, mv))
      val first = tryRefresh()
      assert(!first.isInstanceOf[graft.tables.CdfNotExpressible])
      def rows(): Set[Seq[Any]] =
        mv.read.select("color", "zone", "sum_v", "cnt")
          .collect().map(_.toSeq).toSet
      val afterCrash = rows()
      assert(afterCrash.contains(Seq("gold", "eu", 50L, 1L)),
        "the d1 slice before the crash must have absorbed the new key once")
      // retries keep crashing on d2's slice — and must NOT change the
      // absorbed state (the naive resume double-counted the gold group
      // on every retry: the fact slice replayed against d1's new pin)
      tryRefresh(); tryRefresh()
      assert(rows() === afterCrash,
        "retried refreshes must not re-absorb already-pinned slices")
      // defuse and complete: the pending d2 slice absorbs exactly once
      mv.dropCheck("no_apac")
      assert(JoinMv.refresh(spark, mv) === "cdf-dims")
      val f = fact.read
      val a = d1.read
      val b = d2.read
      val want = f.join(a, f("t") === a("t"))
        .join(b, f("r") === b("r"))
        .groupBy(a("color"), b("zone"))
        .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
        .select("color", "zone", "sum_v", "cnt")
        .collect().map(_.toSeq).toSet
      assert(rows() === want)
      assert(mv.history.count(_.action == "overwrite") === 1)
    } finally MvRewrite.deregister(mv)
  }

  test("crash replay of a dim slice: a stale dim-version property " +
       "resumes from the per-side txn ledger, never double-counting") {
    MvRewrite.install(spark)
    val root = tmpDir("graft-jmv-dcr-")
    val fact = new VersionedTable(spark, s"$root/fact")
    val dim = new VersionedTable(spark, s"$root/dim")
    val mv = new VersionedTable(spark, s"$root/mv")
    fact.enableChangeFeed(); dim.enableChangeFeed()
    fact.append(Seq((1, "p1", 10L), (2, "p3", 5L)).toDF("t", "player", "v"))
    dim.append(Seq((1, "red"), (2, "blue")).toDF("t", "color"))
    JoinMv.create(fact, dim, Seq(("t", "t")), Seq("color"), sumAggs, mv)
    try {
      val coveredBefore = mv.properties(JoinMv.DimVersionProp)
      dim.update(Map("color" -> lit("gold")), col("t") === 1)
      assert(JoinMv.refresh(spark, mv) === "cdf-dims")
      val rows = mvRows(mv)
      val mvV = mv.latestVersion.get
      // crash window: dim-slice merge committed, property bump lost
      mv.setProperties(Map(JoinMv.DimVersionProp -> coveredBefore))
      assert(JoinMv.refresh(spark, mv) === "noop",
        "per-dim ledger resume must see the slice as already absorbed")
      assert(mvRows(mv) === rows)
      assert(mv.latestVersion.get === mvV, "replay must be metadata-only")
    } finally MvRewrite.deregister(mv)
  }

  test("min/max agg sets fall back to full on dim movement (signed " +
       "deltas cannot retract a max); a feedless dim still recomputes") {
    MvRewrite.install(spark)
    val aggs = sumAggs :+ MvRewrite.AggSpec("max", "v", "max_v")
    val root = tmpDir("graft-jmv-mm-")
    val fact = new VersionedTable(spark, s"$root/fact")
    val dim = new VersionedTable(spark, s"$root/dim")
    val mv = new VersionedTable(spark, s"$root/mv")
    fact.enableChangeFeed(); dim.enableChangeFeed()
    fact.append(Seq((1, "p1", 10L), (2, "p3", 5L)).toDF("t", "player", "v"))
    dim.append(Seq((1, "red"), (2, "blue")).toDF("t", "color"))
    JoinMv.create(fact, dim, Seq(("t", "t")), Seq("color"), aggs, mv)
    try {
      dim.update(Map("color" -> lit("gold")), col("t") === 1)
      assert(JoinMv.refresh(spark, mv) === "full")
      assert(mv.read.select("color", "max_v").orderBy("color")
        .as[(String, Long)].collect().toSeq ===
        Seq(("blue", 5L), ("gold", 10L)))
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
