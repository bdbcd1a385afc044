package graft.tables

import graft.SparkSpec

/** The SQL maintenance surface ([[GraftSql]]): parsed OPTIMIZE / VACUUM
  * statements complete the lifecycle next to the DESCRIBE relation flows
  * (reference intent: docs/backlog.md:103-106, the empty
  * notebooks/05_ops/61_optimize_and_maintenance.sql). */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private def warehouse(): (Catalog, GraftSql) = {
    val cat = new Catalog(spark, tmpDir("graft-sql-"))
    cat.bootstrap()
    (cat, GraftSql(spark, cat))
  }

  test("OPTIMIZE bin-packs small file-sets and preserves the data exactly") {
    val (cat, sql) = warehouse()
    val t = cat.table("silver", "kv")
    (0 until 3).foreach(i => t.append(Seq((i, s"v$i")).toDF("k", "v")))
    assert(t.history.last.fileSets.length === 3)
    val m = sql.sql("OPTIMIZE silver.kv").as[
      (String, Long, Long, Long, Long)].head()
    assert(m === (("compact", 2L, 3L, 3L, 1L)))
    assert(t.read.as[(Int, String)].collect().toSet ===
      Set((0, "v0"), (1, "v1"), (2, "v2")))
  }

  test("OPTIMIZE leaves file-sets above the small-file threshold alone") {
    val (cat, sql) = warehouse()
    val t = cat.table("silver", "big")
    t.append((0 until 5000).map(i => (i, s"v$i")).toDF("k", "v"))
    t.append(Seq((9999, "tiny")).toDF("k", "v"))
    t.append(Seq((9998, "tiny2")).toDF("k", "v"))
    // drop the threshold so the first (larger) file-set counts as big:
    // only the two tiny appends fold, the big set is carried verbatim
    spark.conf.set(GraftSql.SmallFileBytesConf, "4096")
    try {
      val m = sql.sql("OPTIMIZE silver.big")
        .select("operation", "file_sets_after").as[(String, Long)].head()
      assert(m === (("compact", 2L))) // 1 big carried + 1 folded
    } finally spark.conf.unset(GraftSql.SmallFileBytesConf)
    assert(t.read.count() === 5002)
  }

  test("OPTIMIZE ZORDER BY clusters and keeps range skipping alive") {
    val (cat, sql) = warehouse()
    val t = cat.table("gold", "zz")
    t.append((0 until 2000).map(i => (i, i % 97, s"p$i")).toDF("a", "b", "v"))
    val m = sql.sql("OPTIMIZE gold.zz ZORDER BY (a, b)")
      .select("operation").as[String].head()
    assert(m === "zorder")
    assert(t.read.count() === 2000)
    // z-order wrote multi-column stats: a readRange on the SECOND column
    // must still return exact results (the skipping itself is pinned in
    // VersionedTableSpec; here we pin the statement wiring end-to-end)
    assert(t.readRange("b", "10", "12").count() ===
      (0 until 2000).count(i => (10 to 12).contains(i % 97)))
  }

  test("VACUUM DRY RUN previews exactly what VACUUM then reclaims") {
    val (cat, sql) = warehouse()
    val t = cat.table("bronze", "ev")
    (0 until 3).foreach(i => t.append(Seq((i, s"v$i")).toDF("k", "v")))
    sql.sql("OPTIMIZE bronze.ev")
    val preview = sql.sql("VACUUM bronze.ev RETAIN 1 VERSIONS DRY RUN")
      .as[String].collect()
    assert(preview.length === 3) // the three pre-compaction file-sets
    val n = sql.sql("VACUUM bronze.ev RETAIN 1 VERSIONS")
      .as[Long].head()
    assert(n === 3L)
    assert(sql.sql("VACUUM bronze.ev RETAIN 1 VERSIONS DRY RUN").count() === 0)
    assert(t.read.count() === 3) // live snapshot untouched
  }

  test("DESCRIBE HISTORY / DETAIL and spark.sql fallback share the funnel") {
    val (cat, sql) = warehouse()
    val t = cat.table("silver", "h")
    t.append(Seq((1, "a")).toDF("k", "v"))
    t.overwrite(Seq((2, "b")).toDF("k", "v"))
    val hist = sql.sql("DESCRIBE HISTORY silver.h")
      .select("version", "action").as[(Long, String)].collect().toList
    assert(hist === List((0L, "append"), (1L, "overwrite")))
    assert(sql.sql("DESC DETAIL silver.h").columns.contains("num_buckets"))
    // non-maintenance statements delegate verbatim
    assert(sql.sql("SELECT 41 + 1 AS x").as[Int].head() === 42)
  }

  test("path identifier graft.`...` works without a catalog; bad names fail loudly") {
    val root = tmpDir("graft-sql-path-")
    val t = VersionedTable(spark, root)
    (0 until 2).foreach(i => t.append(Seq((i, s"v$i")).toDF("k", "v")))
    val sql = GraftSql(spark)
    val m = sql.sql(s"OPTIMIZE graft.`$root`")
      .select("file_sets_after").as[Long].head()
    assert(m === 1L)
    val e = intercept[RuntimeException](sql.sql("OPTIMIZE silver.kv"))
    assert(e.getMessage.contains("no catalog bound"))
    val (cat, catSql) = warehouse()
    val e2 = intercept[RuntimeException](catSql.sql("VACUUM silver.absent"))
    assert(e2.getMessage.contains("table not found"))
  }

  test("RESTORE TABLE TO VERSION / TIMESTAMP AS OF rolls back through SQL") {
    val (cat, sql) = warehouse()
    val t = cat.table("silver", "r")
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))   // v0
    val ts0 = t.history.last.tsMillis
    Thread.sleep(3)
    t.overwrite(Seq((9, "z")).toDF("k", "v"))          // v1
    val m = sql.sql("RESTORE TABLE silver.r TO VERSION AS OF 0")
      .as[(String, Long, Long)].head()
    assert(m === (("restore", 1L, 2L)))
    assert(t.read.as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b")))
    // TIMESTAMP AS OF: format the v0 commit instant in UTC and restore
    // to it — lands on v0's contents again from the post-restore head
    t.overwrite(Seq((8, "y")).toDF("k", "v"))          // v3
    val tsLit = java.time.Instant.ofEpochMilli(ts0)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    sql.sql(s"RESTORE TABLE silver.r TO TIMESTAMP AS OF '$tsLit'")
    assert(t.read.as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b")))
  }

  test("OPTIMIZE WHERE compacts only the named partition's cells") {
    val (cat, sql) = warehouse()
    val t = cat.table("gold", "pt")
    val rows = (0 until 100).map(i => (i, if (i % 2 == 0) "a" else "b", s"v$i"))
    t.merge(rows.toDF("k", "p", "v"), Seq("k"), numBuckets = 2,
      partitionBy = Seq("p"))
    // a second merge into partition a rewrites only a's touched cells
    t.merge(Seq((0, "a", "v0b"), (2, "a", "v2b")).toDF("k", "p", "v"), Seq("k"))
    val before = t.history.last.fileSets.toSet
    val m = sql.sql("OPTIMIZE gold.pt WHERE p = 'a'")
      .select("operation").as[String].head()
    assert(m === "compact")
    // partition b's cells are carried VERBATIM (same file-set names,
    // hex tag p62.) while partition a's (p61.) are rewritten — the
    // statement really scoped to one partition
    val after = t.history.last.fileSets.toSet
    val carried = before.intersect(after)
    val rewritten = after.diff(before)
    assert(carried.nonEmpty && carried.forall(_.contains(".p62.")))
    assert(rewritten.nonEmpty && rewritten.forall(_.contains(".p61.")))
    assert(t.read.count() === 100)
    assert(t.read.filter($"k" === 0).select("v").as[String].head() === "v0b")
    // wrong predicate shapes fail loudly instead of mis-scoping
    val e = intercept[Exception](sql.sql("OPTIMIZE gold.pt WHERE q = 'a'"))
    assert(e.getMessage.contains("partition keys"))
  }

  test("CREATE TABLE … SHALLOW CLONE forks a zero-copy independent table") {
    val (cat, sql) = warehouse()
    val t = cat.table("silver", "src")
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    t.append(Seq((3, "c")).toDF("k", "v"))
    val m = sql.sql("CREATE TABLE gold.fork SHALLOW CLONE silver.src")
      .as[(String, Long, Long)].head()
    assert(m === (("clone", 1L, 2L)))
    val fork = cat.table("gold", "fork")
    assert(fork.read.as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b"), (3, "c")))
    // clone evolves independently of the source
    fork.append(Seq((4, "d")).toDF("k", "v"))
    assert(fork.read.count() === 4)
    assert(t.read.count() === 3)
    // cloning onto an existing table refuses loudly
    val e = intercept[Exception](
      sql.sql("CREATE TABLE gold.fork SHALLOW CLONE silver.src"))
    assert(e.getMessage.contains("already has versions"))
  }

  test("CONVERT TO GRAFT adopts a parquet dir; ANALYZE backfills statistics") {
    val (cat, sql) = warehouse()
    val plain = tmpDir("graft-sql-conv-") + "/plain"
    spark.range(0, 500).toDF("id").coalesce(2).write.parquet(plain)
    val m = sql.sql(s"CONVERT TO GRAFT parquet.`$plain` AS bronze.adopted")
      .as[(String, Long, Long)].head()
    assert(m === (("convert", 0L, 1L)))
    val t = cat.table("bronze", "adopted")
    assert(t.read.count() === 500)
    t.append(spark.range(500, 600).toDF("id"))
    val n = sql.sql(
      "ANALYZE TABLE bronze.adopted COMPUTE STATISTICS FOR COLUMNS id")
      .as[Long].head()
    assert(n === 2L)       // both file-sets lacked coverage
    assert(sql.sql(
      "ANALYZE TABLE bronze.adopted COMPUTE STATISTICS FOR COLUMNS id")
      .as[Long].head() === 0L) // idempotent
    val out = t.readRange("id", "50", "60")
    assert(out.count() === 11)
    assert(out.inputFiles.length < t.read.inputFiles.length)
  }

  test("OPTIMIZE racing concurrent appends never loses a row") {
    // Maintenance alongside ingest: OPTIMIZE is a read-modify-write, so
    // a concurrent append can win its version slot first — OPTIMIZE must
    // then REFUSE (ConcurrentModificationException, OCC working as
    // designed), never commit a snapshot that drops the racer's rows.
    val (cat, sql) = warehouse()
    val t = cat.table("bronze", "race")
    t.append(Seq((0, "seed")).toDF("k", "v"))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    val opt = pool.submit(new java.util.concurrent.Callable[(Int, Int)] {
      def call(): (Int, Int) = {
        var ok = 0; var refused = 0
        while (!stop.get()) {
          try { sql.sql("OPTIMIZE bronze.race"); ok += 1 }
          catch { case _: java.util.ConcurrentModificationException =>
            refused += 1 }
        }
        (ok, refused)
      }
    })
    try (1 to 8).foreach(i => t.append(Seq((i, s"a$i")).toDF("k", "v")))
    finally {
      stop.set(true)
      val (ok, refused) = opt.get()
      assert(ok + refused > 0, "OPTIMIZE must actually have raced")
      pool.shutdown()
    }
    // every appended row survived whatever interleaving happened
    assert(t.read.as[(Int, String)].collect().toMap ===
      (Map(0 -> "seed") ++ (1 to 8).map(i => i -> s"a$i")))
    // quiescent OPTIMIZE converges the layout
    sql.sql("OPTIMIZE bronze.race")
    assert(t.history.last.fileSets.length === 1)
    assert(t.read.count() === 9)
  }

  test("bucketed tables OPTIMIZE per merge cell, preserving COW routing") {
    val (cat, sql) = warehouse()
    val t = cat.table("gold", "bk")
    t.merge((0 until 200).map(i => (i, s"v$i")).toDF("k", "v"), Seq("k"),
      numBuckets = 4)
    t.merge(Seq((5, "v5b"), (300, "new")).toDF("k", "v"), Seq("k"))
    val m = sql.sql("OPTIMIZE gold.bk")
      .select("operation", "file_sets_after").as[(String, Long)].head()
    assert(m === (("compact", 4L))) // one file-set per bucket cell
    assert(t.read.count() === 201)
    // merge after OPTIMIZE still routes by bucket (COW intact)
    t.merge(Seq((6, "v6b")).toDF("k", "v"), Seq("k"))
    assert(t.read.filter($"k" === 6).as[(Int, String)].head() === ((6, "v6b")))
  }

  test("ANALYZE on a non-graft identifier delegates to vanilla Spark") {
    // ANALYZE is the one owned statement that is ALSO valid Spark SQL:
    // an identifier that doesn't resolve to a graft table (here, a
    // Spark catalog table, no graft catalog bound) must fall through to
    // spark.sql instead of erroring — one funnel for the whole session
    spark.sql("DROP TABLE IF EXISTS an_delegate")
    spark.sql("CREATE TABLE an_delegate (id INT) USING PARQUET")
    try {
      spark.sql("INSERT INTO an_delegate VALUES (1), (2), (3)")
      GraftSql(spark)
        .sql("ANALYZE TABLE an_delegate COMPUTE STATISTICS FOR COLUMNS id")
      val stats = spark.sql("DESCRIBE EXTENDED an_delegate id")
        .as[(String, String)].collect().toMap
      assert(stats.get("distinct_count").exists(_.toLong >= 2L),
        s"vanilla ANALYZE must have run (got $stats)")
    } finally spark.sql("DROP TABLE IF EXISTS an_delegate")
    // and with a catalog bound, a GRAFT table still takes the owned path
    val (cat, gsql) = warehouse()
    val t = cat.table("silver", "anz")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val n = gsql.sql(
      "ANALYZE TABLE silver.anz COMPUTE STATISTICS FOR COLUMNS id")
      .as[Long].head()
    assert(n === 1L)
    assert(t.readEquals("id", Seq(2L)).count() === 1)
  }
}
