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

  test("retraction with the change feed ON recomputes only TOUCHED " +
       "groups (mode groups, no overwrite): untouched groups' sketch " +
       "bytes carry verbatim, a fully-deleted group drops, state " +
       "equals a rebuild") {
    val root = tmpDir("sk-g-")
    val src = VersionedTable(spark, s"$root/src")
    val mv = VersionedTable(spark, s"$root/mv")
    src.enableChangeFeed()
    src.append((0 until 3000).map(i => (s"g${i % 3}", (i % 400).toLong))
      .toDF("g", "k"))
    Sketches.create(src, mv, Seq("g"), "k")
    val untouchedBytes = mv.read.filter(col("g") === "g2")
      .select("distinct_sketch").as[Array[Byte]].head()
    // delete touches ONLY g0; g2 vanishes entirely in a second slice
    src.delete(col("g") === "g0" && col("k") < 100L)
    assert(Sketches.refresh(spark, mv) === "groups")
    assert(mv.history.count(_.action == "overwrite") === 1,
      "the groups path must never rebuild (1 = the CREATE overwrite)")
    def rebuilt(g: String): (Long, Long) = {
      val n = src.read.filter(col("g") === g).count()
      val d = src.read.filter(col("g") === g)
        .select(countDistinct("k")).as[Long].head()
      (n, d)
    }
    estimates(mv).foreach { case (g, (n, est)) =>
      val (rn, rd) = rebuilt(g)
      assert(n === rn, s"$g row count")
      assert(math.abs(est / rd.toDouble - 1.0) < 0.05, s"$g estimate")
    }
    // untouched group's sketch BYTES rode through unrecomputed
    assert(java.util.Arrays.equals(
      mv.read.filter(col("g") === "g2")
        .select("distinct_sketch").as[Array[Byte]].head(), untouchedBytes))
    // vanished group drops, as a rebuild would
    src.delete(col("g") === "g2")
    assert(Sketches.refresh(spark, mv) === "groups")
    assert(mv.read.filter(col("g") === "g2").isEmpty)
    assert(Sketches.refresh(spark, mv) === "noop")
  }

  test("frequency rollup retraction with the change feed ON: touched " +
       "groups recompute, heavy hitters re-rank exactly") {
    val root = tmpDir("cms-g-")
    val src = VersionedTable(spark, s"$root/src")
    val mv = VersionedTable(spark, s"$root/mv")
    src.enableChangeFeed()
    src.append((Seq.fill(500)(("g0", "hot")) ++ Seq.fill(300)(("g0", "warm"))
      ++ Seq.fill(400)(("g1", "only")) ++
      (0 until 200).map(i => ("g0", s"n$i"))).toDF("g", "item"))
    Sketches.createFreq(src, mv, Seq("g"), "item", topM = 3)
    val g1Bytes = mv.read.filter(col("g") === "g1")
      .select("freq_sketch").as[Array[Byte]].head()
    src.delete(col("item") === "hot") // touches only g0
    assert(Sketches.refreshFreq(spark, mv) === "groups")
    assert(Sketches.topFreqItems(mv.read, Seq("g"), 1)
      .filter(col("g") === "g0").select("item", "est_count")
      .as[(String, Long)].head() === (("warm", 300L)),
      "post-retraction top item must re-rank with the EXACT new count")
    assert(java.util.Arrays.equals(
      mv.read.filter(col("g") === "g1")
        .select("freq_sketch").as[Array[Byte]].head(), g1Bytes),
      "untouched group's sketch must carry verbatim")
  }

  test("NULL group keys fall back to a full rebuild — the NULL group " +
       "never splits across duplicate MV rows") {
    val root = tmpDir("sk4-")
    val src = VersionedTable(spark, s"$root/src")
    val mv = VersionedTable(spark, s"$root/mv")
    src.append(Seq((null: String, 1L), (null, 2L), ("g0", 3L))
      .toDF("g", "k"))
    Sketches.create(src, mv, Seq("g"), "k")
    src.append(Seq((null: String, 4L), ("g0", 5L)).toDF("g", "k"))
    assert(Sketches.refresh(spark, mv) === "full",
      "a delta touching the NULL group cannot merge (NULL never matches)")
    val nulls = mv.read.filter(col("g").isNull)
      .select("n_rows").as[Long].collect().toSeq
    assert(nulls === Seq(3L), s"expected ONE NULL-group row, got $nulls")
    src.append(Seq(("g0", 6L)).toDF("g", "k"))
    assert(Sketches.refresh(spark, mv) === "incremental",
      "a NULL-free delta keeps the incremental path even though the " +
        "TABLE holds a NULL group")
  }

  test("re-create over an existing rollup: fresh epoch ignores the old " +
       "era's txn markers and the old bucket spec") {
    val root = tmpDir("sk5-")
    val srcA = VersionedTable(spark, s"$root/srcA")
    val srcB = VersionedTable(spark, s"$root/srcB")
    val mv = VersionedTable(spark, s"$root/mv")
    srcA.append(rows(500, 100).toDF("g", "k"))
    Sketches.create(srcA, mv, Seq("g"), "k")
    // drive srcA's version (and the txn marker) well past srcB's head
    (1 to 4).foreach { i =>
      srcA.append(rows(100, 50).map { case (g, k) => (g, k + i * 1000) }
        .toDF("g", "k"))
      Sketches.refresh(spark, mv)
      ()
    }
    assert(mv.lastTxnVersion("graft-sketch:0:" + mv.root).exists(_ >= 4))
    // re-point at a younger source with a DIFFERENT group column: the
    // overwrite must not bucket by the vanished column, and refresh
    // must not resume from the old era's high-water marker
    srcB.append(Seq(("x", 1L), ("y", 2L)).toDF("h", "k"))
    Sketches.create(srcB, mv, Seq("h"), "k")
    srcB.append(Seq(("x", 3L)).toDF("h", "k"))
    assert(Sketches.refresh(spark, mv) === "incremental",
      "the replaced era's txn marker must never make the new rollup " +
        "read as already-fresh")
    assert(Sketches.withEstimate(mv.read)
      .filter(col("h") === "x").select("n_rows").as[Long].head() === 2L)
  }

  test("a REPLACE across rollup families sweeps the old definition's " +
       "properties — one table never carries two live definitions") {
    val root = tmpDir("sk6-")
    val src = VersionedTable(spark, s"$root/src")
    val mv = VersionedTable(spark, s"$root/mv")
    src.append(rows(500, 100).toDF("g", "k"))
    Sketches.create(src, mv, Seq("g"), "k")
    assert(mv.properties.contains(Sketches.SourceProp))
    // HLL rollup replaced by a CMS rollup: the sketch definition must
    // go, or REFRESH would still dispatch on it against freq data
    Sketches.createFreq(src, mv, Seq("g"), "k")
    assert(!mv.properties.contains(Sketches.SourceProp),
      "replaced HLL definition survived a freq REPLACE")
    assert(mv.properties.contains(Sketches.FreqSourceProp))
    src.append(rows(100, 50).toDF("g", "k"))
    assert(Sketches.refreshFreq(spark, mv) === "incremental")
    // ...and a CMS rollup replaced by a quantile rollup
    Sketches.createQuant(src, mv, Seq("g"), "k")
    assert(!mv.properties.contains(Sketches.FreqSourceProp),
      "replaced freq definition survived a quant REPLACE")
    assert(mv.properties.contains(Sketches.QuantSourceProp))
    src.append(rows(100, 50).toDF("g", "k"))
    assert(Sketches.refreshQuant(spark, mv) === "incremental")
    // epochs survive the sweep: a later same-family re-create must not
    // resume from a dead era's txn markers
    assert(mv.properties.contains(Sketches.EpochProp))
    assert(mv.properties.contains(Sketches.FreqEpochProp))
  }

  test("frequency rollup: merged count-min sketches EXACTLY equal a " +
       "one-shot build; heavy hitters surface through the candidate " +
       "union; estimates never undercount") {
    val root = tmpDir("cms-")
    val src = VersionedTable(spark, s"$root/src")
    val mv = VersionedTable(spark, s"$root/mv")
    // planted skew: item "hot" dominates group g0; "warm" is second
    def slice(tag: String, hotN: Int, warmN: Int, noise: Range) =
      (Seq.fill(hotN)(("g0", "hot")) ++ Seq.fill(warmN)(("g0", "warm")) ++
        noise.map(i => ("g0", s"$tag-n$i"))).toDF("g", "item")
    src.append(slice("a", 500, 200, 0 until 300))
    Sketches.createFreq(src, mv, Seq("g"), "item", topM = 5)
    src.append(slice("b", 400, 300, 0 until 300))
    assert(Sketches.refreshFreq(spark, mv) === "incremental")
    // merged sketch ≡ one-shot rebuild, byte for byte
    val oneShot = Sketches.freqRollup(src.read, Seq("g"), "item", topM = 5)
      .select("freq_sketch").as[Array[Byte]].head()
    val merged = mv.read.select("freq_sketch").as[Array[Byte]].head()
    assert(java.util.Arrays.equals(merged, oneShot),
      "counter-wise CMS merge must equal the from-scratch sketch")
    // readout: hot and warm rank 1/2 with their EXACT planted counts
    val top = Sketches.topFreqItems(mv.read, Seq("g"), 2)
      .select("item", "est_count", "rank")
      .as[(String, Long, Int)].collect().toSeq.sortBy(_._3)
    assert(top.map(_._1) === Seq("hot", "warm"))
    assert(top.head._2 >= 900L, "CMS estimates never undercount")
    // exactness at this width (4000 cells vs ~600 distinct): collisions
    // would only INFLATE — equality pins the planted truth
    assert(top === Seq(("hot", 900L, 1), ("warm", 500L, 2)))
    // retraction → rebuild
    src.delete(col("item") === "warm")
    assert(Sketches.refreshFreq(spark, mv) === "full")
    assert(Sketches.topFreqItems(mv.read, Seq("g"), 1)
      .select("item").as[String].head() === "hot")
  }

  test("frequency rollup: candidate unions stay bounded — an oversized " +
       "group prunes back to the estimate-ranked topM") {
    val root = tmpDir("cms2-")
    val src = VersionedTable(spark, s"$root/src")
    val mv = VersionedTable(spark, s"$root/mv")
    // topM=2, cap=8: each slice contributes 2 fresh candidate names,
    // plus the persistent heavy pair
    def slice(tag: String) =
      (Seq.fill(50)(("g0", "hot")) ++ Seq.fill(30)(("g0", "warm")) ++
        Seq.fill(5)(("g0", s"$tag-x")) ++ Seq.fill(4)(("g0", s"$tag-y")))
        .toDF("g", "item")
    src.append(slice("s0"))
    Sketches.createFreq(src, mv, Seq("g"), "item", topM = 2)
    (1 to 6).foreach { i =>
      src.append(slice(s"s$i"))
      assert(Sketches.refreshFreq(spark, mv) === "incremental")
    }
    val cands = mv.read.select(size(col("top_candidates")))
      .as[Int].head()
    assert(cands <= 8,
      s"candidate state must stay O(topM), got $cands items")
    // the persistent heavy pair survives every prune
    assert(Sketches.topFreqItems(mv.read, Seq("g"), 2)
      .select("item").as[String].collect().toSet === Set("hot", "warm"))
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

  // -------------------------------------------------------------------
  // Quantile rollups
  // -------------------------------------------------------------------

  private def quantState(mv: VersionedTable): Map[String, (Long, Long, Map[Long, Long])] =
    mv.read.select("g", "n_rows", "n_vals", "quant_sketch")
      .as[(String, Long, Long, Map[Long, Long])].collect()
      .map { case (g, nr, nv, m) => g -> ((nr, nv, m)) }.toMap

  private def quantRebuild(src: VersionedTable): Map[String, (Long, Long, Map[Long, Long])] =
    Sketches.quantRollup(src.read, Seq("g"), "v")
      .select("g", "n_rows", "n_vals", "quant_sketch")
      .as[(String, Long, Long, Map[Long, Long])].collect()
      .map { case (g, nr, nv, m) => g -> ((nr, nv, m)) }.toMap

  test("quantile rollup: merged histograms EXACTLY equal a one-shot " +
       "build, and readouts stay inside the 1/(2*sub) relative bound " +
       "across negatives, zeros and NULLs") {
    val root = tmpDir("qt-")
    val src = VersionedTable(spark, s"$root/src")
    val mv = VersionedTable(spark, s"$root/mv")
    // deterministic spread over ~5 octaves, both signs, zeros, NULLs
    def vals(tag: Int, n: Int) = (0 until n).map { i =>
      val v = ((i * 37 + tag * 11) % 997) match {
        case 0 => 0.0
        case x if x % 13 == 0 => -(x.toDouble / 7.0)
        case x => x.toDouble / 3.0
      }
      (s"g${i % 3}", if (i % 29 == 0) None else Some(v))
    }
    src.append(vals(0, 3000).toDF("g", "v"))
    Sketches.createQuant(src, mv, Seq("g"), "v")
    src.append(vals(1, 2000).toDF("g", "v"))
    assert(Sketches.refreshQuant(spark, mv) === "incremental")
    assert(quantState(mv) === quantRebuild(src),
      "bucket-count addition must equal the from-scratch histogram")
    // readout accuracy: ceil(q*n)-th smallest vs bucket midpoint
    val approx = Sketches.quantValues(mv.read, Seq("g"),
        Seq(0.1, 0.5, 0.9, 0.99))
      .select("g", "q", "approx_value")
      .as[(String, Double, Double)].collect()
    assert(approx.length === 12)
    val byGroup = src.read.filter(col("v").isNotNull)
      .select("g", "v").as[(String, Double)].collect()
      .groupBy(_._1).map { case (g, a) => g -> a.map(_._2).sorted }
    approx.foreach { case (g, q, est) =>
      val xs = byGroup(g)
      val exact = xs(math.max(0, math.ceil(q * xs.length).toInt - 1))
      val bound = math.abs(exact) / 32.0 * 1.01 + 0.01
      assert(math.abs(est - exact) <= bound,
        s"$g q=$q est=$est exact=$exact bound=$bound")
    }
  }

  test("quantile rollup absorbs RETRACTIONS incrementally through the " +
       "change feed — cdf mode, merged state ≡ rebuild, emptied group " +
       "drops; without the feed the same slice rebuilds") {
    val root = tmpDir("qt2-")
    val src = VersionedTable(spark, s"$root/src")
    val mv = VersionedTable(spark, s"$root/mv")
    src.enableChangeFeed()
    def slice(tag: Int) = (0 until 800).map(i =>
      (s"g${i % 3}", ((i * 31 + tag) % 500).toDouble / 2.0))
    src.append(slice(0).toDF("g", "v"))
    Sketches.createQuant(src, mv, Seq("g"), "v")
    src.append(slice(1).toDF("g", "v"))
    src.delete(col("v") < 50.0)
    src.update(Map("v" -> (col("v") + lit(1000.0))), col("v") > 200.0)
    assert(Sketches.refreshQuant(spark, mv) === "cdf",
      "histogram counts subtract — deletes/updates must NOT rebuild")
    assert(quantState(mv) === quantRebuild(src),
      "signed bucket merge must equal the from-scratch histogram")
    // emptied group: delete every g2 row
    src.delete(col("g") === "g2")
    assert(Sketches.refreshQuant(spark, mv) === "cdf")
    assert(!quantState(mv).contains("g2"), "emptied group must drop")
    assert(quantState(mv) === quantRebuild(src))
    assert(Sketches.refreshQuant(spark, mv) === "noop")
    // feed off: the same retraction shape falls back to a rebuild
    val src2 = VersionedTable(spark, s"$root/src2")
    val mv2 = VersionedTable(spark, s"$root/mv2")
    src2.append(slice(0).toDF("g", "v"))
    Sketches.createQuant(src2, mv2, Seq("g"), "v")
    src2.delete(col("v") < 50.0)
    assert(Sketches.refreshQuant(spark, mv2) === "full")
    assert(quantState(mv2) === quantRebuild(src2))
  }

  test("graft_quant_hist single-pass aggregate equals the relational " +
       "rollup bucket-for-bucket (the JVM and SQL bucket functions are " +
       "twins) and the per-row readout equals quantValues") {
    graft.functions.QuantFunctions.register(spark)
    val df = (0 until 4000).map { i =>
      val v = ((i * 37) % 997) match {
        case 0                => 0.0
        case x if x % 13 == 0 => -(x.toDouble / 7.0)
        case x                => x.toDouble / 3.0
      }
      (s"g${i % 4}", if (i % 29 == 0) None else Some(v))
    }.toDF("g", "v")
    val viaAgg = df.groupBy("g").agg(
      call_function("graft_quant_hist", col("v").cast("double"), lit(1L),
        lit(100L), lit(16)).as("h"))
    val rollup = Sketches.quantRollup(df, Seq("g"), "v")
    assert(viaAgg.as[(String, Map[Long, Long])].collect().toMap ===
      rollup.select("g", "quant_sketch")
        .as[(String, Map[Long, Long])].collect().toMap)
    // scalar readout (the MV presentation path) ≡ relational quantValues
    val perRow = rollup
      .select(col("g"),
        expr(Sketches.quantReadoutSql("quant_sketch", "0.9")).as("v90"))
      .as[(String, Double)].collect().toMap
    val relational = Sketches.quantValues(rollup, Seq("g"), Seq(0.9))
      .select("g", "approx_value").as[(String, Double)].collect().toMap
    assert(perRow === relational)
  }

  test("quantile rollup crash replay: a stale covered-version property " +
       "replays the signed merge as a txn no-op") {
    val root = tmpDir("qt3-")
    val src = VersionedTable(spark, s"$root/src")
    val mv = VersionedTable(spark, s"$root/mv")
    src.enableChangeFeed()
    src.append((0 until 500).map(i => (s"g${i % 2}", i.toDouble))
      .toDF("g", "v"))
    Sketches.createQuant(src, mv, Seq("g"), "v")
    val covered = mv.properties(Sketches.QuantVersionProp)
    src.delete(col("v") < 100.0)
    assert(Sketches.refreshQuant(spark, mv) === "cdf")
    val snap = quantState(mv)
    val mvV = mv.latestVersion.get
    mv.setProperties(Map(Sketches.QuantVersionProp -> covered))
    assert(Sketches.refreshQuant(spark, mv) === "noop",
      "the txn ledger must recognize the absorbed slice")
    assert(quantState(mv) === snap)
    assert(mv.latestVersion.get === mvV)
  }

  test("sketch rollups pin their source: retention cannot demote the " +
       "incremental path; the pin advances with each refresh") {
    val root = tmpDir("sk-pin-")
    val src = VersionedTable(spark, s"$root/src")
    val mv = VersionedTable(spark, s"$root/mv")
    src.append(rows(2000, 300).toDF("g", "k"))                     // v0
    Sketches.create(src, mv, Seq("g"), "k")
    val pin = s"mv:${mv.root}"
    assert(src.pins.get(pin).contains(0L))
    src.append(rows(1000, 400).map { case (g, k) => (g, k + 900) }
      .toDF("g", "k"))                                             // v1
    src.compact()                                                  // v2
    // the pin holds the added sets the next refresh reads
    assert(src.vacuum(retainVersions = 1) === Seq.empty)
    assert(Sketches.refresh(spark, mv) === "incremental",
      "retention must not demote the sketch refresh to a rebuild")
    assert(src.pins(pin) === 2L)
    // advanced pin releases the pre-compaction history
    assert(src.vacuum(retainVersions = 1).nonEmpty)
    // the merged estimate still equals a one-shot rebuild
    val fresh = VersionedTable(spark, s"$root/fresh")
    Sketches.create(src, fresh, Seq("g"), "k")
    assert(estimates(mv).view.mapValues(_._2).toMap ===
      estimates(fresh).view.mapValues(_._2).toMap)
  }
}
