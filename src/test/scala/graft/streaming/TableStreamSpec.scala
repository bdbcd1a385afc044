package graft.streaming

import graft.SparkSpec
import graft.tables.VersionedTable

import org.apache.spark.sql.streaming.Trigger

/** [[GraftTableSource]]: a versioned table consumed as a Structured
  * Streaming source — version-log offsets, O(new data) batches,
  * checkpointed exactly-once restarts, and a CDF mode that streams
  * row-level updates/deletes (the Delta streaming-source contract). */
class TableStreamSpec extends SparkSpec {
  import spark.implicits._

  private def runOnce(root: String, cp: String, sinkTbl: String,
                      options: Map[String, String] = Map.empty): Unit = {
    val q = options.foldLeft(spark.readStream.format("graft-table")) {
      case (r, (k, v)) => r.option(k, v)
    }.load(root)
      .writeStream
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        VersionedTable(spark, sinkTbl)
          .append(batch, txn = Some((cp, id)))
        ()
      }
      .start()
    q.awaitTermination()
  }

  test("initial batch is the snapshot; appends stream incrementally") {
    val root = tmpDir("ts-src-")
    val sink = tmpDir("ts-sink-")
    val cp = tmpDir("ts-cp-")
    val t = VersionedTable(spark, root)
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    t.append(Seq((3, "c")).toDF("k", "v"))

    runOnce(root, cp, sink)
    val out = VersionedTable(spark, sink)
    assert(out.read.as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b"), (3, "c")))

    // two more appends, same checkpoint: ONLY the new rows flow
    t.append(Seq((4, "d")).toDF("k", "v"))
    t.append(Seq((5, "e")).toDF("k", "v"))
    runOnce(root, cp, sink)
    assert(out.read.count() === 5)
    // and the incremental batch did not re-deliver the snapshot
    assert(out.read.as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")))

    // no new commits, same checkpoint: nothing is re-delivered
    runOnce(root, cp, sink)
    assert(out.read.count() === 5)
  }

  test("startingTimestamp starts at the first commit at-or-after the time") {
    val root = tmpDir("ts-st-")
    val t = VersionedTable(spark, root)
    t.append(Seq((1, "old")).toDF("k", "v"))        // v0
    Thread.sleep(1100) // distinct wall-clock seconds for the boundary
    t.append(Seq((2, "new")).toDF("k", "v"))        // v1
    val v1s = java.time.Instant.ofEpochMilli(t.history.last.tsMillis)
      .atZone(java.time.ZoneOffset.UTC).toLocalDateTime
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))
    // at-or-after v1's second: v1's own rows included, v0's excluded
    val sink = tmpDir("ts-st-sink-")
    runOnce(root, tmpDir("ts-st-cp-"), sink,
      Map("startingTimestamp" -> v1s))
    assert(VersionedTable(spark, sink).read.as[(Int, String)]
      .collect().toSet === Set((2, "new")))
    // far future: nothing until a post-start commit lands
    val sink2 = tmpDir("ts-st-sink2-")
    val cp2 = tmpDir("ts-st-cp2-")
    runOnce(root, cp2, sink2, Map("startingTimestamp" -> "2999-01-01"))
    val s2 = VersionedTable(spark, sink2)
    assert(!s2.exists || s2.read.count() === 0) // an empty batch-0 is fine
    t.append(Seq((3, "future")).toDF("k", "v"))
    runOnce(root, cp2, sink2, Map("startingTimestamp" -> "2999-01-01"))
    assert(VersionedTable(spark, sink2).read.as[(Int, String)]
      .collect().toSet === Set((3, "future")))
    // both options together refuse loudly
    assertThrows[Exception](
      runOnce(root, tmpDir("ts-st-cp3-"), tmpDir("ts-st-sink3-"),
        Map("startingTimestamp" -> v1s, "startingVersion" -> "0")))
  }

  test("stream restart across RENAME COLUMN delivers new batches under the new name") {
    val root = tmpDir("ts-rn-")
    val sinkA = tmpDir("ts-rn-sinkA-")
    val sinkB = tmpDir("ts-rn-sinkB-")
    val cp = tmpDir("ts-rn-cp-")
    val t = VersionedTable(spark, root)
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    runOnce(root, cp, sinkA) // pre-rename era drains under the old name
    assert(VersionedTable(spark, sinkA).read.columns.toSeq === Seq("k", "v"))

    // metadata-only DDL between runs, then data under the new name; the
    // RESTARTED stream re-declares its schema from the current mapping,
    // so the incremental batch surfaces `val` (a boundary Delta's
    // streaming source refuses with a schema-change error)
    t.renameColumn("v", "val")
    t.append(Seq((3, "c")).toDF("k", "val"))
    runOnce(root, cp, sinkB)
    val b = VersionedTable(spark, sinkB)
    assert(b.read.columns.toSeq === Seq("k", "val"))
    assert(b.read.as[(Int, String)].collect().toSet === Set((3, "c")))

    // a rename with NO new appends: the restart must deliver nothing
    // (the DDL commit itself carries no rows)
    t.renameColumn("val", "value")
    runOnce(root, cp, tmpDir("ts-rn-sinkC-"))
    assert(b.read.count() === 1)
  }

  test("startingVersion=latest skips existing data") {
    val root = tmpDir("ts-late-")
    val sink = tmpDir("ts-late-sink-")
    val cp = tmpDir("ts-late-cp-")
    val t = VersionedTable(spark, root)
    t.append(Seq((1, "old")).toDF("k", "v"))
    runOnce(root, cp, sink, Map("startingVersion" -> "latest"))
    // one EMPTY pin-recording batch, no data: the pre-pin row must not flow
    assert(VersionedTable(spark, sink).read.count() === 0)
    t.append(Seq((2, "new")).toDF("k", "v"))
    runOnce(root, cp, sink, Map("startingVersion" -> "latest"))
    assert(VersionedTable(spark, sink).read.as[(Int, String)]
      .collect().toSet === Set((2, "new")))
  }

  test("skipChangeCommits rides an append stream across delete/update/" +
       "merge commits, delivering only the appends; contradictory with " +
       "readChangeFeed") {
    val root = tmpDir("ts-skip-")
    val sink = tmpDir("ts-skip-sink-")
    val cp = tmpDir("ts-skip-cp-")
    val t = VersionedTable(spark, root)
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))          // v0
    runOnce(root, cp, sink, Map("skipChangeCommits" -> "true"))
    val out = VersionedTable(spark, sink)
    assert(out.read.count() === 2)
    // a delete, an update, a merge and an append inside ONE range:
    // only the append's rows flow; nothing fails
    t.delete($"k" === 1)                                       // v1
    t.update(Map("v" -> org.apache.spark.sql.functions.lit("b2")), $"k" === 2)                // v2
    t.merge(Seq((5, "e")).toDF("k", "v"), Seq("k"))            // v3
    t.append(Seq((3, "c"), (4, "d")).toDF("k", "v"))           // v4
    runOnce(root, cp, sink, Map("skipChangeCommits" -> "true"))
    assert(out.read.as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b"), (3, "c"), (4, "d")),
      "only the appended rows flow — the merge's insert rides its " +
        "rewritten bucket and is skipped WITH the change commit")
    // idempotent: nothing new re-delivers
    runOnce(root, cp, sink, Map("skipChangeCommits" -> "true"))
    assert(out.read.count() === 4)
    // with the feed: contradictory options refuse at query start
    t.enableChangeFeed()
    assertThrows[Exception](
      runOnce(root, tmpDir("ts-skip-cp2-"), tmpDir("ts-skip-sink2-"),
        Map("skipChangeCommits" -> "true", "readChangeFeed" -> "true")))
  }

  test("a row-changing commit inside a batch range fails the stream loudly") {
    val root = tmpDir("ts-dml-")
    val sink = tmpDir("ts-dml-sink-")
    val cp = tmpDir("ts-dml-cp-")
    val t = VersionedTable(spark, root)
    t.append(Seq((1, "a")).toDF("k", "v"))
    runOnce(root, cp, sink)
    t.delete($"k" === 1)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce(root, cp, sink)
    }
    assert(e.getMessage.contains("change feed") ||
      Option(e.getCause).exists(_.getMessage.contains("change feed")))
  }

  test("maintenance commits (compact/zorder) do not break an append stream") {
    val root = tmpDir("ts-mnt-")
    val sink = tmpDir("ts-mnt-sink-")
    val cp = tmpDir("ts-mnt-cp-")
    val t = VersionedTable(spark, root)
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    runOnce(root, cp, sink)
    // a compaction between appends is data-identical: the stream must
    // skip it and deliver exactly the appended rows — this is the shape
    // a table-to-table pipeline's OWN sink autoCompactEvery produces
    t.append(Seq((3, "c")).toDF("k", "v"))
    t.compact()
    t.append(Seq((4, "d")).toDF("k", "v"))
    runOnce(root, cp, sink)
    assert(VersionedTable(spark, sink).read.as[(Int, String)]
      .collect().toSet === Set((1, "a"), (2, "b"), (3, "c"), (4, "d")))
    // and a maintenance-only tail delivers nothing new
    t.compact()
    runOnce(root, cp, sink)
    assert(VersionedTable(spark, sink).read.count() === 4)
  }

  test("rate-limit floor lives in the checkpoint, never under the CWD") {
    val src = tmpDir("ts-floor-src-")
    val cp = tmpDir("ts-floor-cp-")
    val t = VersionedTable(spark, src)
    (0 until 3).foreach(i => t.append(Seq((i, s"v$i")).toDF("k", "v")))
    val q = spark.readStream.format("graft-table")
      .option("maxVersionsPerTrigger", "1").load(src)
      .writeStream.option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
      .start()
    q.awaitTermination()
    // Spark hands createSource a URI form of <cp>/sources/0; the floor
    // file must resolve THERE (Hadoop path semantics), not to a literal
    // "file:..." directory under the driver's working directory
    assert(new java.io.File(s"$cp/sources/0/graft-served").isFile)
    val cwd = new java.io.File(".").getCanonicalFile
    assert(!cwd.listFiles().exists(_.getName.startsWith("file:")),
      "stream run scattered 'file:*' state under the CWD")
  }

  test("maxBytesPerTrigger drains a backlog in byte-bounded batches") {
    val src = tmpDir("ts-mbt-src-")
    val cp = tmpDir("ts-mbt-cp-")
    val t = VersionedTable(spark, src)
    (0 until 3).foreach(i => t.append(
      (0 until 100).map(j => (i * 100 + j, s"v$j")).toDF("k", "v")))
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val rows = new java.util.concurrent.atomic.AtomicLong(0)
    // a 1-byte cap is below any version's size: the at-least-one rule
    // admits exactly ONE version per micro-batch (Delta's soft cap)
    val q = spark.readStream.format("graft-table")
      .option("maxBytesPerTrigger", "1").load(src)
      .writeStream.option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = df.count()
        if (n > 0) { batches.incrementAndGet(); rows.addAndGet(n) }
        ()
      }
      .start()
    q.awaitTermination()
    assert(rows.get() === 300)
    assert(batches.get() === 3,
      s"1-byte cap must admit one version per batch, got ${batches.get()}")
  }

  test("a startingVersion past the head waits instead of crashing") {
    val src = tmpDir("ts-fut-src-")
    val sink = tmpDir("ts-fut-sink-")
    val cp = tmpDir("ts-fut-cp-")
    val t = VersionedTable(spark, src)
    t.append(Seq((1, "a")).toDF("k", "v")) // v0
    // pin two commits into the future: nothing exists to serve, so no
    // batch fires at all (the sink table is never even created)
    runOnce(src, cp, sink, Map("startingVersion" -> "2"))
    assert(!VersionedTable(spark, sink).exists)
    t.append(Seq((2, "b")).toDF("k", "v")) // v1 — still before the pin
    t.append(Seq((3, "c")).toDF("k", "v")) // v2 — the pinned version
    runOnce(src, cp, sink, Map("startingVersion" -> "2"))
    assert(VersionedTable(spark, sink).read.as[(Int, String)]
      .collect().toSet === Set((3, "c")))
  }

  test("a rename landing mid-run re-binds to the DECLARED names in the " +
       "same run; a mid-run DROP of a declared column still stops loudly") {
    val root = tmpDir("ts-rnmid-")
    val sink = tmpDir("ts-rnmid-sink-")
    val cp = tmpDir("ts-rnmid-cp-")
    val t = VersionedTable(spark, root)
    t.append(Seq((1, "a")).toDF("k", "v"))                        // v0
    t.append(Seq((2, "b")).toDF("k", "v"))                        // v1
    // ONE query run, rate-limited to one version per batch; the DDL
    // lands between batch 0 and batch 1 INSIDE the run. A rename is
    // metadata-only, so batch 1 (reading the table's current names)
    // reverse-maps to the query's declared `v` and the run completes —
    // Delta needs schemaTrackingLocation plus a restart here. An
    // impostor under the old name is impossible by construction — ADD
    // COLUMNS refuses re-using a renamed-away name.
    val q = spark.readStream.format("graft-table")
      .option("maxVersionsPerTrigger", "1").load(root)
      .writeStream
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        if (id == 0L) t.renameColumn("v", "val")
        VersionedTable(spark, sink).append(batch, txn = Some((cp, id)))
        ()
      }
      .start()
    q.awaitTermination()
    val out = VersionedTable(spark, sink)
    assert(out.read.columns.toSeq === Seq("k", "v"),
      "the in-flight query must keep its declared names across a rename")
    assert(out.read.as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b")),
      "batch 1 must deliver the renamed column's data under the " +
        "declared name")
    // DROP of a declared column cannot be reconstructed — the
    // stop-with-guidance stands
    val t2root = tmpDir("ts-dropmid-")
    val t2 = VersionedTable(spark, t2root)
    t2.append(Seq((1, "a")).toDF("k", "v"))
    val src2 = new GraftTableSource(t2, cdf = false,
      startingVersion = None, maxVersionsPerTrigger = None,
      metadataPath = "file:" + tmpDir("ts-dropmid-cp-") + "/sources/0")
    t2.dropColumn("v")
    t2.append(Seq(2).toDF("k"))
    val e = intercept[RuntimeException] {
      src2.getBatch(None,
        org.apache.spark.sql.execution.streaming.runtime.LongOffset(
          t2.latestVersion.get))
    }
    assert(e.getMessage.contains("Restart the query") &&
      e.getMessage.contains("change feed"))
  }

  test("sink: table-to-table streaming pipeline is exactly-once across restarts") {
    val src = tmpDir("ts-pipe-src-")
    val dst = tmpDir("ts-pipe-dst-")
    val cp = tmpDir("ts-pipe-cp-")
    val t = VersionedTable(spark, src)
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))

    def pipe(): Unit = {
      val q = spark.readStream.format("graft-table").load(src)
        .writeStream.format("graft-table")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    pipe()
    val out = VersionedTable(spark, dst)
    assert(out.read.as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b")))
    // restart with new upstream commits: only the delta flows; a
    // replayed batch id would be a txn no-op, so rerunning with NO new
    // commits changes nothing
    t.append(Seq((3, "c")).toDF("k", "v"))
    pipe()
    pipe()
    assert(out.read.as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b"), (3, "c")))
    assert(out.read.count() === 3)
  }

  test("sink: a malformed numBuckets fails loudly, naming the option") {
    val dst = tmpDir("ts-nbk-dst-")
    def startWith(nb: String): Throwable = {
      val cp = tmpDir("ts-nbk-cp-")
      val srcDir = tmpDir("ts-nbk-in-") + "/landing"
      Seq((1, "x")).toDF("k", "v").coalesce(1).write.json(srcDir)
      intercept[Throwable] {
        val q = spark.readStream.schema("k INT, v STRING").json(srcDir)
          .writeStream.format("graft-table")
          .option("checkpointLocation", cp)
          .option("mergeKeys", "k")
          .option("numBuckets", nb)
          .trigger(Trigger.AvailableNow())
          .start(dst)
        q.awaitTermination()
      }
    }
    // misconfigured first-contact bucket counts must not silently fall
    // back to the default layout: the error names the option and value
    for (bad <- Seq("abc", "0", "-4")) {
      val e = startWith(bad)
      val msg = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msg.contains("numBuckets") && msg.contains(bad),
        s"error for numBuckets=$bad must name the option: $msg")
    }
  }

  test("sink: Complete mode overwrites the snapshot per batch") {
    val dst = tmpDir("ts-cmpl-dst-")
    val cp = tmpDir("ts-cmpl-cp-")
    val srcDir = tmpDir("ts-cmpl-in-") + "/landing"
    Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "v")
      .coalesce(1).write.json(srcDir)
    val q = spark.readStream.schema("k INT, v STRING").json(srcDir)
      .groupBy($"k").count()
      .writeStream.format("graft-table")
      .outputMode("complete")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination()
    assert(VersionedTable(spark, dst).read.as[(Int, Long)]
      .collect().toSet === Set((1, 2L), (2, 1L)))
  }

  test("sink: Update mode with mergeKeys upserts changed groups per batch") {
    val dst = tmpDir("ts-upd-dst-")
    val cp = tmpDir("ts-upd-cp-")
    val landing = tmpDir("ts-upd-in-") + "/landing"
    Seq((1, 10L), (2, 20L)).toDF("k", "amt").coalesce(1).write.json(landing)
    def drain(): Unit = {
      val q = spark.readStream.schema("k INT, amt BIGINT").json(landing)
        .groupBy($"k").agg(
          org.apache.spark.sql.functions.sum($"amt").as("total"),
          org.apache.spark.sql.functions.count($"amt").as("n"))
        .writeStream.format("graft-table")
        .outputMode("update")
        .option("checkpointLocation", cp)
        .option("mergeKeys", "k")
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    drain()
    assert(VersionedTable(spark, dst).read.as[(Int, Long, Long)]
      .collect().toSet === Set((1, 10L, 1L), (2, 20L, 1L)))
    // key 1 revisited: its cumulative row must UPDATE, key 3 INSERTs,
    // key 2 (unchanged, not re-emitted in Update mode) must survive
    Seq((1, 5L), (3, 30L)).toDF("k", "amt")
      .coalesce(1).write.mode("append").json(landing)
    drain()
    assert(VersionedTable(spark, dst).read.as[(Int, Long, Long)]
      .collect().toSet === Set((1, 15L, 2L), (2, 20L, 1L), (3, 30L, 1L)))
    // replaying with no new data changes nothing (txn idempotence on
    // the merge path)
    drain()
    assert(VersionedTable(spark, dst).read.count() === 3)
  }

  test("sink: windowed streaming aggregation in Update mode merges by window") {
    val dst = tmpDir("ts-win-dst-")
    val cp = tmpDir("ts-win-cp-")
    val landing = tmpDir("ts-win-in-") + "/landing"
    // the canonical Update-mode user: a time-windowed count. The window
    // struct itself is a merge key — hash() handles struct keys, so the
    // bucket-COW routing works unchanged.
    Seq(("2026-01-01 00:01:00", "u1"), ("2026-01-01 00:02:00", "u1"),
        ("2026-01-01 00:11:00", "u2"))
      .toDF("ts", "user").coalesce(1).write.json(landing)
    def drain(): Unit = {
      val q = spark.readStream.schema("ts STRING, user STRING").json(landing)
        .withColumn("ts", $"ts".cast("timestamp"))
        .withWatermark("ts", "1 hour") // generous: the late row must UPDATE, not drop
        .groupBy(org.apache.spark.sql.functions.window($"ts", "10 minutes"),
          $"user")
        .count()
        .writeStream.format("graft-table")
        .outputMode("update")
        .option("checkpointLocation", cp)
        .option("mergeKeys", "window,user")
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    drain()
    val read1 = VersionedTable(spark, dst).read
      .selectExpr("CAST(window.start AS STRING) AS ws", "user", "count")
      .as[(String, String, Long)].collect().toSet
    assert(read1 === Set(
      ("2026-01-01 00:00:00", "u1", 2L),
      ("2026-01-01 00:10:00", "u2", 1L)))
    // a late-but-in-watermark row lands in an EXISTING window: its
    // cumulative count must update in place, not duplicate the window
    Seq(("2026-01-01 00:03:00", "u1")).toDF("ts", "user")
      .coalesce(1).write.mode("append").json(landing)
    drain()
    val read2 = VersionedTable(spark, dst).read
      .selectExpr("CAST(window.start AS STRING) AS ws", "user", "count")
      .as[(String, String, Long)].collect().toSet
    assert(read2 === Set(
      ("2026-01-01 00:00:00", "u1", 3L),
      ("2026-01-01 00:10:00", "u2", 1L)))
  }

  test("sink: Update mode without mergeKeys is refused loudly") {
    val dst = tmpDir("ts-updx-dst-")
    val cp = tmpDir("ts-updx-cp-")
    val landing = tmpDir("ts-updx-in-") + "/landing"
    Seq((1, 10L)).toDF("k", "amt").coalesce(1).write.json(landing)
    val e = intercept[Exception] {
      val q = spark.readStream.schema("k INT, amt BIGINT").json(landing)
        .groupBy($"k").count()
        .writeStream.format("graft-table")
        .outputMode("update")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    def anyMsg(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("mergeKeys")) ||
        anyMsg(t.getCause))
    assert(anyMsg(e))
  }

  test("maxVersionsPerTrigger drains a backlog in bounded micro-batches") {
    val src = tmpDir("ts-rate-src-")
    val cp = tmpDir("ts-rate-cp-")
    val t = VersionedTable(spark, src)
    (0 until 5).foreach(i => t.append(Seq((i, s"v$i")).toDF("k", "v")))
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    def drain(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("maxVersionsPerTrigger", "2").load(src)
        .writeStream.option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          sizes.synchronized { sizes += b.count() }
          ()
        }.start()
      q.awaitTermination()
    }
    drain()
    // first batch = snapshot through the cap (versions -1..1 = 2 rows),
    // then 2-version batches: 2, 1 — never one giant catch-up batch
    assert(sizes.toList === List(2L, 2L, 1L))
    assert(sizes.sum === 5L)
    // restart with more commits: the clamp resumes from the checkpoint
    (5 until 8).foreach(i => t.append(Seq((i, s"v$i")).toDF("k", "v")))
    sizes.clear()
    drain()
    assert(sizes.toList === List(2L, 1L))
    assert(sizes.sum === 3L)
  }

  test("sink autoCompactEvery folds the small-file tail as batches land") {
    val src = tmpDir("ts-ac-src-")
    val dst = tmpDir("ts-ac-dst-")
    val cp = tmpDir("ts-ac-cp-")
    val t = VersionedTable(spark, src)
    (0 until 6).foreach(i => t.append(Seq((i, s"v$i")).toDF("k", "v")))
    val q = spark.readStream.format("graft-table")
      .option("maxVersionsPerTrigger", "1").load(src) // 1 file-set per batch
      .writeStream.format("graft-table")
      .option("checkpointLocation", cp)
      .option("autoCompactEvery", "3")
      .trigger(Trigger.AvailableNow())
      .start(dst)
    q.awaitTermination()
    val out = VersionedTable(spark, dst)
    assert(out.read.count() === 6)
    // without compaction there would be 6 file-sets (one per batch);
    // the every-3rd-batch folds keep the tail bounded
    assert(out.history.last.fileSets.length < 6)
    assert(out.history.exists(_.action === "compact"))
  }

  test("sink: applyChanges replicates a DML'd table through its change feed") {
    val src = tmpDir("ts-ac2-src-")
    val replica = tmpDir("ts-ac2-rep-")
    val cp = tmpDir("ts-ac2-cp-")
    val t = VersionedTable(spark, src)
    t.enableChangeFeed()
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))            // v0
    t.merge(Seq((2, "b2"), (3, "c")).toDF("k", "v"), Seq("k"))  // v1
    t.delete($"k" === 1)                                        // v2
    def sync(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(src)
        .writeStream.format("graft-table")
        .option("checkpointLocation", cp)
        .option("mergeKeys", "k")
        .option("applyChanges", "true")
        .trigger(Trigger.AvailableNow())
        .start(replica)
      q.awaitTermination()
    }
    sync()
    val out = VersionedTable(spark, replica)
    assert(out.read.as[(Int, String)].collect().toSet ===
      Set((2, "b2"), (3, "c")))
    // more DML, incremental resync: only the change feed tail applies
    t.merge(Seq((3, "c3"), (4, "d")).toDF("k", "v"), Seq("k"))  // v3
    t.delete($"k" === 2)                                        // v4
    sync()
    assert(out.read.as[(Int, String)].collect().toSet ===
      Set((3, "c3"), (4, "d")))
    // replay with nothing new: the replica is untouched (idempotent)
    sync()
    assert(out.read.as[(Int, String)].collect().toSet ===
      Set((3, "c3"), (4, "d")))
    // replace_where: ONE commit emits delete(K) AND insert(K) for every
    // replaced key — the per-key pick must rank the same-version delete
    // below the insert, or the replica nondeterministically drops
    // replaced keys. k=3 is replaced (must survive with the new value),
    // k=0 is net-new within the slice, k=4 is outside the predicate
    // (untouched).
    t.replaceWhere($"k" <= 3,
      Seq((3, "c9"), (0, "i")).toDF("k", "v"))                  // v5
    sync()
    assert(out.read.as[(Int, String)].collect().toSet ===
      Set((0, "i"), (3, "c9"), (4, "d")))
  }

  test("sink: numBuckets sizes a FRESH merge target's bucket layout; an " +
       "existing table's frozen spec wins over a later option") {
    val src = tmpDir("ts-nb-src-")
    val replica = tmpDir("ts-nb-rep-")
    val cp = tmpDir("ts-nb-cp-")
    val t = VersionedTable(spark, src)
    t.enableChangeFeed()
    t.append((0 until 40).map(i => (i, s"v$i")).toDF("k", "v"))
    def sync(buckets: Int): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(src)
        .writeStream.format("graft-table")
        .option("checkpointLocation", cp)
        .option("mergeKeys", "k")
        .option("applyChanges", "true")
        .option("numBuckets", buckets.toString)
        .trigger(Trigger.AvailableNow())
        .start(replica)
      q.awaitTermination()
    }
    sync(4)
    val out = VersionedTable(spark, replica)
    assert(out.bucketSpec.map(_.numBuckets) === Some(4),
      "a fresh target must adopt the option's bucket count")
    assert(out.read.count() === 40)
    // a later run with a DIFFERENT option: the frozen spec wins (the
    // layout is a table property, not a per-query one)
    t.append(Seq((100, "x")).toDF("k", "v"))
    sync(8)
    assert(out.bucketSpec.map(_.numBuckets) === Some(4))
    assert(out.read.count() === 41)
  }

  test("sink: aggregate mode maintains an MV from the change feed, " +
    "retractions included") {
    val src = tmpDir("ts-agg-src-")
    val mvRoot = tmpDir("ts-agg-mv-")
    val cp = tmpDir("ts-agg-cp-")
    val t = VersionedTable(spark, src)
    t.enableChangeFeed()
    t.append(Seq(("a", 10L), ("a", 2L), ("b", 5L), ("c", 1L))
      .toDF("k", "v"))                                          // v0
    def sync(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(src)
        .writeStream.format("graft-table")
        .option("checkpointLocation", cp)
        .option("mergeKeys", "k")
        .option("aggregate", "sum:v:sum_v;count:*:cnt;count:v:cnt_v")
        .trigger(Trigger.AvailableNow())
        .start(mvRoot)
      q.awaitTermination()
    }
    sync()
    val mv = VersionedTable(spark, mvRoot)
    def state(): Set[(String, Option[Long], Long, Long)] =
      mv.read.as[(String, Option[Long], Long, Long)].collect().toSet
    assert(state() === Set(("a", Some(12L), 2L, 2L), ("b", Some(5L), 1L, 1L),
      ("c", Some(1L), 1L, 1L)))
    // retraction mix: reprice, empty a group, append a new group
    t.update(Map("v" -> ($"v" * 10L)), $"v" === 2L)             // v1
    t.delete($"k" === "c")                                      // v2
    t.append(Seq(("d", 7L)).toDF("k", "v"))                     // v3
    sync()
    assert(state() === Set(("a", Some(30L), 2L, 2L), ("b", Some(5L), 1L, 1L),
      ("d", Some(7L), 1L, 1L)))
    // nothing new: idempotent no-op
    sync()
    assert(state() === Set(("a", Some(30L), 2L, 2L), ("b", Some(5L), 1L, 1L),
      ("d", Some(7L), 1L, 1L)))
    // == full recompute over the final source state
    val full = t.read.groupBy("k")
      .agg(org.apache.spark.sql.functions.sum("v").as("sum_v"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.count($"v").as("cnt_v"))
      .as[(String, Option[Long], Long, Long)].collect().toSet
    assert(state() === full)
  }

  test("sink: joinDims maintains a STAR rollup from the fact change " +
    "feed — dims pinned at first use, recorded before any data lands, " +
    "and a dim mutation between rounds never leaks into the stream") {
    val factRoot = tmpDir("ts-jagg-fact-")
    val dimRoot = tmpDir("ts-jagg-dim-")
    val mvRoot = tmpDir("ts-jagg-mv-")
    val cp = tmpDir("ts-jagg-cp-")
    val fact = VersionedTable(spark, factRoot)
    val dim = VersionedTable(spark, dimRoot)
    fact.enableChangeFeed()
    fact.append(Seq((1, 10L), (1, 2L), (2, 5L), (3, 1L)).toDF("t", "v"))
    dim.append(Seq((1, "red"), (2, "blue"), (3, "red")).toDF("t", "color"))
    val dimPin = dim.latestVersion.get
    def sync(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(factRoot)
        .writeStream.format("graft-table")
        .option("checkpointLocation", cp)
        .option("mergeKeys", "color")
        .option("aggregate", "sum:v:sum_v;count:*:cnt;count:v:cnt_v")
        .option("joinDims", dimRoot)
        .option("joinKeys", "t=t")
        .trigger(Trigger.AvailableNow())
        .start(mvRoot)
      q.awaitTermination()
    }
    sync()
    val mv = VersionedTable(spark, mvRoot)
    def state(): Set[(String, Option[Long], Long, Long)] =
      mv.read.select("color", "sum_v", "cnt", "cnt_v")
        .as[(String, Option[Long], Long, Long)].collect().toSet
    assert(state() === Set(("red", Some(13L), 3L, 3L),
      ("blue", Some(5L), 1L, 1L)))
    assert(mv.properties(GraftTableSink.StreamDimVersionProp) ===
      dimPin.toString, "the dim pin must be recorded on the MV")
    // round 2: fact DML (retraction included) + a DIM mutation that
    // must NOT affect the stream (the pin was recorded in round 1)
    dim.overwrite(Seq((1, "green"), (2, "green"), (3, "green"))
      .toDF("t", "color"))
    fact.update(Map("v" -> ($"v" * 10L)), $"v" === 2L)
    fact.delete($"t" === 2)
    fact.append(Seq((3, 7L)).toDF("t", "v"))
    sync()
    assert(state() === Set(("red", Some(38L), 4L, 4L)),
      "round-2 deltas must join the PINNED dim snapshot: t=2's group " +
        "vanishes (blue, not green), t=3 stays red")
    // == batch recompute against the pinned dim version
    val f = fact.read; val d = dim.readVersion(dimPin)
    val full = f.join(d, f("t") === d("t")).groupBy(d("color"))
      .agg(org.apache.spark.sql.functions.sum("v").as("sum_v"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.count($"v").as("cnt_v"))
      .select("color", "sum_v", "cnt", "cnt_v")
      .as[(String, Option[Long], Long, Long)].collect().toSet
    assert(state() === full)
    // idempotent: nothing new is a no-op
    sync()
    assert(state() === full)
    // a restart naming a DIFFERENT dim must refuse, not apply the
    // recorded pin to the wrong table
    val other = VersionedTable(spark, tmpDir("ts-jagg-dim2-"))
    other.append(Seq((1, "x")).toDF("t", "color"))
    fact.append(Seq((1, 1L)).toDF("t", "v"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(factRoot)
        .writeStream.format("graft-table")
        .option("checkpointLocation", cp)
        .option("mergeKeys", "color")
        .option("aggregate", "sum:v:sum_v;count:*:cnt;count:v:cnt_v")
        .option("joinDims", other.root)
        .option("joinKeys", "t=t")
        .trigger(Trigger.AvailableNow())
        .start(mvRoot)
      q.awaitTermination()
    }
    assert(e.getMessage.contains("differ from the definition recorded"))
    // ... and so must a restart with different JOIN KEYS (same dims):
    // the landed batches were computed under the recorded keys
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(factRoot)
        .writeStream.format("graft-table")
        .option("checkpointLocation", cp)
        .option("mergeKeys", "color")
        .option("aggregate", "sum:v:sum_v;count:*:cnt;count:v:cnt_v")
        .option("joinDims", dimRoot)
        .option("joinKeys", "v=t")
        .trigger(Trigger.AvailableNow())
        .start(mvRoot)
      q.awaitTermination()
    }
    assert(e2.getMessage.contains("joinKeys differ"))
  }

  test("sink: dedupKeys keeps the FIRST row per key across batches and " +
    "replays — at-least-once upstream, exactly-once-by-content table") {
    val landing = tmpDir("ts-ddk-land-")
    val sinkRoot = tmpDir("ts-ddk-sink-")
    val cp = tmpDir("ts-ddk-cp-")
    def land(rows: Seq[(String, String)], part: String): Unit =
      rows.toDF("h", "payload").coalesce(1)
        .write.mode("append").json(s"$landing/$part")
    def drain(): Unit = {
      val q = spark.readStream.schema("h STRING, payload STRING")
        .json(s"$landing/*")
        .writeStream.format("graft-table")
        .option("checkpointLocation", cp)
        .option("dedupKeys", "h")
        .trigger(Trigger.AvailableNow())
        .start(sinkRoot)
      q.awaitTermination()
    }
    // batch 1: an in-batch duplicate (identical payload — content hash)
    land(Seq(("a", "pa"), ("a", "pa"), ("b", "pb")), "p1")
    drain()
    val sink = VersionedTable(spark, sinkRoot)
    def state(): Map[String, String] =
      sink.read.as[(String, String)].collect().toMap
    assert(state() === Map("a" -> "pa", "b" -> "pb"))
    // batch 2: a re-delivery of `a` with a DIFFERENT payload (keep-first
    // must win — latest-wins would show px) + a new key
    land(Seq(("a", "px"), ("c", "pc")), "p2")
    drain()
    assert(state() === Map("a" -> "pa", "b" -> "pb", "c" -> "pc"))
    // nothing new: idempotent
    drain()
    assert(state() === Map("a" -> "pa", "b" -> "pb", "c" -> "pc"))
    assert(sink.read.count() === 3)
    // mode exclusivity fails at query start
    val e = intercept[Exception] {
      spark.readStream.schema("h STRING, payload STRING")
        .json(s"$landing/*")
        .writeStream.format("graft-table")
        .option("checkpointLocation", tmpDir("ts-ddk-cp2-"))
        .option("dedupKeys", "h").option("mergeKeys", "h")
        .trigger(Trigger.AvailableNow())
        .start(tmpDir("ts-ddk-sink2-"))
    }
    assert(e.getMessage.contains("its own mode"))
    // NULL dedup keys can never keep-first (MERGE never matches NULL):
    // refuse loudly rather than re-landing the row every redelivery
    land(Seq((null: String, "pnull")), "p3")
    val en = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      drain())
    assert(en.getMessage.contains("NULL dedup key"))
  }

  test("sink: joinDims shape errors fail at query start") {
    val factRoot = tmpDir("ts-jerr-fact-")
    val fact = VersionedTable(spark, factRoot)
    fact.enableChangeFeed()
    fact.append(Seq((1, 10L)).toDF("t", "v"))
    val e1 = intercept[Exception] {
      spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(factRoot)
        .writeStream.format("graft-table")
        .option("checkpointLocation", tmpDir("ts-jerr-cp1-"))
        .option("mergeKeys", "t")
        .option("joinDims", "/nowhere")
        .trigger(Trigger.AvailableNow())
        .start(tmpDir("ts-jerr-mv1-"))
    }
    assert(e1.getMessage.contains("joinDims needs aggregate mode"))
    val e2 = intercept[Exception] {
      spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(factRoot)
        .writeStream.format("graft-table")
        .option("checkpointLocation", tmpDir("ts-jerr-cp2-"))
        .option("mergeKeys", "t")
        .option("aggregate", "count:*:c")
        .option("joinDims", "/a;/b")
        .option("joinKeys", "t=t")
        .trigger(Trigger.AvailableNow())
        .start(tmpDir("ts-jerr-mv2-"))
    }
    assert(e2.getMessage.contains("joinKeys"))
  }

  test("sink: aggregate mode maintains quant HISTOGRAM columns from " +
    "the change feed — retractions subtract bucket counts, merged " +
    "state equals a one-shot rebuild") {
    val src = tmpDir("ts-qagg-src-")
    val mvRoot = tmpDir("ts-qagg-mv-")
    val cp = tmpDir("ts-qagg-cp-")
    val t = VersionedTable(spark, src)
    t.enableChangeFeed()
    t.append((0 until 900).map(i => (s"g${i % 2}", (i % 300).toDouble / 2.0))
      .toDF("k", "v"))                                          // v0
    def sync(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(src)
        .writeStream.format("graft-table")
        .option("checkpointLocation", cp)
        .option("mergeKeys", "k")
        .option("aggregate", "count:*:cnt;quant0.5:v:p50")
        .trigger(Trigger.AvailableNow())
        .start(mvRoot)
      q.awaitTermination()
    }
    sync()
    graft.functions.QuantFunctions.register(spark)
    val mv = VersionedTable(spark, mvRoot)
    def state(): Map[String, (Long, Map[Long, Long])] =
      mv.read.select("k", "cnt", "p50")
        .as[(String, Long, Map[Long, Long])].collect()
        .map { case (k, c, m) => k -> ((c, m)) }.toMap
    def rebuild(): Map[String, (Long, Map[Long, Long])] =
      t.read.groupBy("k").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.call_function("graft_quant_hist",
          $"v".cast("double"), org.apache.spark.sql.functions.lit(1L),
          org.apache.spark.sql.functions.lit(
            graft.tables.GraftSql.MvQuantScale),
          org.apache.spark.sql.functions.lit(
            graft.tables.GraftSql.MvQuantSub)).as("p50"))
        .as[(String, Long, Map[Long, Long])].collect()
        .map { case (k, c, m) => k -> ((c, m)) }.toMap
    assert(state() === rebuild())
    // retraction mix: deletes and updates subtract from exactly the
    // buckets they once incremented; an emptied... (g1 survives)
    t.delete($"v" < 30.0)                                       // v1
    t.update(Map("v" -> ($"v" + 500.0)), $"v" > 120.0)          // v2
    t.append(Seq(("g2", 7.5)).toDF("k", "v"))                   // v3
    sync()
    assert(state() === rebuild(),
      "signed bucket merge must equal the from-scratch histogram")
    // replay with nothing new: idempotent
    sync()
    assert(state() === rebuild())
    // the presented readout (per-row cumulative walk) stays within the
    // 1/(2·sub) relative bound of the exact median
    val got = mv.read.selectExpr("k",
        graft.ops.Sketches.quantReadoutSql("p50", "0.5") + " AS est")
      .as[(String, Double)].collect().toMap
    val exact = t.read.select("k", "v").as[(String, Double)].collect()
      .groupBy(_._1).map { case (k, a) =>
        val xs = a.map(_._2).sorted
        k -> xs(math.max(0, math.ceil(0.5 * xs.length).toInt - 1))
      }
    got.foreach { case (k, est) =>
      val e = exact(k)
      assert(math.abs(est - e) <= math.abs(e) / 32.0 * 1.01 + 0.01,
        s"$k est=$est exact=$e")
    }
  }

  test("sink: aggregateFilter maintains a FILTERED streaming MV - rows " +
    "crossing the predicate boundary absorb as signed deltas") {
    val src = tmpDir("ts-fagg-src-")
    val mvRoot = tmpDir("ts-fagg-mv-")
    val cp = tmpDir("ts-fagg-cp-")
    val t = VersionedTable(spark, src)
    t.enableChangeFeed()
    t.append(Seq((1L, "a", 10L, "eu"), (2L, "a", 20L, "us"),
      (3L, "b", 5L, "eu")).toDF("id", "k", "v", "r"))           // v0
    def sync(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(src)
        .writeStream.format("graft-table")
        .option("checkpointLocation", cp)
        .option("mergeKeys", "k")
        .option("aggregate", "sum:v:sum_v;count:*:cnt;count:v:cnt_v")
        .option("aggregateFilter", "r = 'eu'")
        .trigger(Trigger.AvailableNow())
        .start(mvRoot)
      q.awaitTermination()
    }
    sync()
    val mv = VersionedTable(spark, mvRoot)
    def state(): Set[(String, Option[Long], Long, Long)] =
      mv.read.as[(String, Option[Long], Long, Long)].collect().toSet
    assert(state() === Set(("a", Some(10L), 1L, 1L), ("b", Some(5L), 1L, 1L)))
    // id=1 leaves the slice, id=2 enters it, d appends inside it
    t.update(Map("r" -> org.apache.spark.sql.functions.lit("us")), $"id" === 1L)               // v1
    t.update(Map("r" -> org.apache.spark.sql.functions.lit("eu")), $"id" === 2L)               // v2
    t.append(Seq((4L, "d", 7L, "eu")).toDF("id", "k", "v", "r")) // v3
    sync()
    assert(state() === Set(("a", Some(20L), 1L, 1L), ("b", Some(5L), 1L, 1L),
      ("d", Some(7L), 1L, 1L)))
    // == full recompute of the predicate slice
    val full = t.read.filter($"r" === "eu").groupBy("k")
      .agg(org.apache.spark.sql.functions.sum("v").as("sum_v"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"),
        org.apache.spark.sql.functions.count($"v").as("cnt_v"))
      .as[(String, Option[Long], Long, Long)].collect().toSet
    assert(state() === full)
    // a broken predicate fails at query START
    val e = intercept[Exception] {
      spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(src)
        .writeStream.format("graft-table")
        .option("checkpointLocation", tmpDir("ts-fagg-bad-"))
        .option("mergeKeys", "k")
        .option("aggregate", "count:*:c")
        .option("aggregateFilter", "r = = 'eu'")
        .trigger(Trigger.AvailableNow())
        .start(tmpDir("ts-fagg-bad-mv-"))
    }
    assert(e.getMessage != null)
  }

  test("sink: aggregate mode on a non-CDF stream is refused loudly") {
    val src = tmpDir("ts-aggx-src-")
    val t = VersionedTable(spark, src)
    t.append(Seq(("a", 1L)).toDF("k", "v"))
    val q = spark.readStream.format("graft-table").load(src)
      .writeStream.format("graft-table")
      .option("checkpointLocation", tmpDir("ts-aggx-cp-"))
      .option("mergeKeys", "k")
      .option("aggregate", "sum:v:s;count:v:cv;count:*:c")
      .trigger(Trigger.AvailableNow())
      .start(tmpDir("ts-aggx-mv-"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      q.awaitTermination())
    assert(e.getMessage.contains("change-feed") ||
      Option(e.getCause).exists(_.getMessage.contains("change-feed")))
  }

  test("sink: a malformed aggregate spec fails at query START, " +
       "not at the first micro-batch") {
    val src = tmpDir("ts-aggspec-src-")
    val t = VersionedTable(spark, src)
    t.enableChangeFeed()
    t.append(Seq(("a", 1L)).toDF("k", "v"))
    val e = intercept[RuntimeException] {
      spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(src)
        .writeStream.format("graft-table")
        .option("checkpointLocation", tmpDir("ts-aggspec-cp-"))
        .option("mergeKeys", "k")
        .option("aggregate", "avg:v:m;count:*:c")
        .trigger(Trigger.AvailableNow())
        .start(tmpDir("ts-aggspec-mv-"))
    }
    assert(e.getMessage.contains("bad aggregate spec"))
  }

  test("sink: insert-only aggregate path maintains min/max and hll " +
       "sketch columns from an append-only stream; a retraction fails " +
       "the query loudly") {
    val src = tmpDir("ts-ins-src-")
    val mvRoot = tmpDir("ts-ins-mv-")
    val cp = tmpDir("ts-ins-cp-")
    val t = VersionedTable(spark, src)
    t.enableChangeFeed()
    t.append(Seq(("a", 10L), ("a", 2L), ("b", 5L)).toDF("k", "v"))
    def sync(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(src)
        .writeStream.format("graft-table")
        .option("checkpointLocation", cp)
        .option("mergeKeys", "k")
        .option("aggregate",
          "min:v:min_v;max:v:max_v;count:*:cnt;hll:v:du;topk2:v:top_v")
        .trigger(Trigger.AvailableNow())
        .start(mvRoot)
      q.awaitTermination()
    }
    sync()
    val mv = VersionedTable(spark, mvRoot)
    graft.functions.SketchFunctions.register(spark)
    def state(): Set[(String, Long, Long, Long, Long)] =
      mv.read.selectExpr("k", "min_v", "max_v", "cnt",
        "hll_sketch_estimate(du)")
        .as[(String, Long, Long, Long, Long)].collect().toSet
    // the topk struct combines on the same insert-only path: top-1 by
    // estimate (ties break item-ascending on the stringified values)
    def tops(): Map[String, String] =
      mv.read.selectExpr("k",
          graft.tables.GraftSql.topkReadoutSql("top_v", 1) + " AS t")
        .selectExpr("k", "t[0].item")
        .as[(String, String)].collect().toMap
    assert(state() === Set(("a", 2L, 10L, 2L, 2L), ("b", 5L, 5L, 1L, 1L)))
    assert(tops() === Map("a" -> "10", "b" -> "5"))
    // a second append: mins/maxes combine, sketches union, all per key
    t.append(Seq(("a", 7L), ("c", 3L)).toDF("k", "v"))
    sync()
    assert(state() === Set(("a", 2L, 10L, 3L, 3L), ("b", 5L, 5L, 1L, 1L),
      ("c", 3L, 3L, 1L, 1L)))
    assert(tops() === Map("a" -> "10", "b" -> "5", "c" -> "3"))
    // replay with nothing new: idempotent
    sync()
    assert(state() === Set(("a", 2L, 10L, 3L, 3L), ("b", 5L, 5L, 1L, 1L),
      ("c", 3L, 3L, 1L, 1L)))
    // a delete reaches the insert-only path → the query fails loudly
    t.delete($"k" === "b")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      sync()
    }
    def messages(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(e0 =>
        Option(e0.getMessage).toSeq ++ messages(e0.getCause))
    assert(messages(e).exists(_.contains("insert-only")))
  }

  test("CDF stream over a table with pre-head OVERWRITE history " +
    "bootstraps with the snapshot as inserts, then streams granularly") {
    val root = tmpDir("ts-cdfboot-")
    val cp = tmpDir("ts-cdfboot-cp-")
    val t = VersionedTable(spark, root)
    t.enableChangeFeed()
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))           // v0
    t.overwrite(Seq((2, "b2"), (3, "c")).toDF("k", "v"))       // v1: not
    t.append(Seq((4, "d")).toDF("k", "v"))                     // v2
    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Int, String)]
    def drain(): Unit = {
      val q = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(root)
        .writeStream
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          collected.synchronized {
            collected ++= batch
              .select("_commit_version", "_change_type", "k", "v")
              .as[(Long, String, Int, String)].collect()
          }
          ()
        }
        .start()
      q.awaitTermination()
    }
    drain()
    // granular replay is inexpressible across the v1 overwrite — the
    // stream must still START, delivering the v2 snapshot as inserts
    assert(collected.toSet === Set(
      (2L, "insert", 2, "b2"), (2L, "insert", 3, "c"),
      (2L, "insert", 4, "d")))
    // from the bootstrap on, changes stream granularly
    collected.clear()
    t.delete($"k" === 3)                                       // v3
    drain()
    assert(collected.toSet === Set((3L, "delete", 3, "c")))
  }

  test("readChangeFeed mode streams row-level updates and deletes") {
    val root = tmpDir("ts-cdf-")
    val cp = tmpDir("ts-cdf-cp-")
    val t = VersionedTable(spark, root)
    t.enableChangeFeed()
    t.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))          // v0
    t.merge(Seq((2, "b2"), (3, "c")).toDF("k", "v"), Seq("k")) // v1
    t.delete($"k" === 1)                                       // v2

    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Int, String)]
    val q = spark.readStream.format("graft-table")
      .option("readChangeFeed", "true").load(root)
      .writeStream
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        collected.synchronized {
          collected ++= batch
            .select("_commit_version", "_change_type", "k", "v")
            .as[(Long, String, Int, String)].collect()
        }
        ()
      }
      .start()
    q.awaitTermination()
    assert(collected.toSet === Set(
      (0L, "insert", 1, "a"), (0L, "insert", 2, "b"),
      (1L, "update_preimage", 2, "b"), (1L, "update_postimage", 2, "b2"),
      (1L, "insert", 3, "c"),
      (2L, "delete", 1, "a")))
  }

  test("the source pins its committed floor on the table; retention " +
       "cannot sever a checkpointed stream's replay range") {
    val root = tmpDir("ts-pin-")
    val sink = tmpDir("ts-pin-sink-")
    val cp = tmpDir("ts-pin-cp-")
    val t = VersionedTable(spark, root)
    t.append(Seq((1, "a")).toDF("k", "v"))                       // v0
    runOnce(root, cp, sink)
    // the first batch registered a checkpoint-named retention floor
    val pinned = t.pinsDetail.keys.filter(_.startsWith("stream:"))
    assert(pinned.size === 1, s"expected one stream pin, got $pinned")
    t.append(Seq((2, "b")).toDF("k", "v"))                       // v1
    t.append(Seq((3, "c")).toDF("k", "v"))                       // v2
    t.compact()                                                  // v3
    // pin at the committed floor holds the backlog the restart replays
    assert(t.vacuum(retainVersions = 1) === Seq.empty)
    runOnce(root, cp, sink)
    assert(VersionedTable(spark, sink).read
      .as[(Int, String)].collect().toSet ===
      Set((1, "a"), (2, "b"), (3, "c")))
    // the floor advances with the NEXT batch (getBatch's lo is the
    // committed offset; AvailableNow runs never commit() their last
    // batch) — after one more batch, vacuum reclaims behind it
    t.append(Seq((4, "d")).toDF("k", "v"))                       // v4
    runOnce(root, cp, sink)
    assert(t.pins(pinned.head) >= 3L,
      "the restart's batch must advance the floor to its lo offset")
    assert(t.vacuum(retainVersions = 1).nonEmpty)
    // pinRetention=false opts out entirely
    val root2 = tmpDir("ts-pin2-")
    val t2 = VersionedTable(spark, root2)
    t2.append(Seq((1, "a")).toDF("k", "v"))
    runOnce(root2, tmpDir("ts-pin2-cp-"), tmpDir("ts-pin2-sink-"),
      Map("pinRetention" -> "false"))
    assert(t2.pins.isEmpty)
  }

  test("stateful sink modes are single-writer: a second stream refuses " +
       "the lease loudly, sinkOwnerTakeover re-points it, restarts " +
       "re-claim silently") {
    val src1 = tmpDir("ts-lease-src1-")
    val src2 = tmpDir("ts-lease-src2-")
    val dst = tmpDir("ts-lease-dst-")
    val cp1 = tmpDir("ts-lease-cp1-")
    val cp2 = tmpDir("ts-lease-cp2-")
    val t1 = VersionedTable(spark, src1)
    val t2 = VersionedTable(spark, src2)
    t1.append(Seq((1, 10L)).toDF("k", "v"))
    t2.append(Seq((1, 99L)).toDF("k", "v"))
    def run(from: String, cp: String, extra: Map[String, String] = Map.empty): Unit = {
      val q = extra.foldLeft(spark.readStream.format("graft-table")
          .load(from).writeStream.format("graft-table")
          .option("checkpointLocation", cp)
          .option("mergeKeys", "k")
          .outputMode("update")) { case (w, (k, v)) => w.option(k, v) }
        .trigger(Trigger.AvailableNow()).start(dst)
      q.awaitTermination()
    }
    run(src1, cp1) // first stream claims the lease
    val out = VersionedTable(spark, dst)
    assert(out.sinkOwner.contains(cp1))
    assert(out.read.as[(Int, Long)].collect().toSet === Set((1, 10L)))
    // restart of the SAME checkpoint re-claims silently
    t1.append(Seq((2, 20L)).toDF("k", "v"))
    run(src1, cp1)
    assert(out.read.count() === 2)
    // a SECOND stream (different checkpoint) refuses loudly, writes nothing
    val e = intercept[Exception](run(src2, cp2))
    def rootCauseMsg(t: Throwable): String =
      Option(t.getCause).map(rootCauseMsg).getOrElse(t.getMessage)
    assert(rootCauseMsg(e).contains("owned by another sink"))
    assert(out.read.count() === 2, "the refused sink must write NOTHING")
    // explicit takeover re-points the lease
    run(src2, cp2, Map("sinkOwnerTakeover" -> "true"))
    assert(out.sinkOwner.contains(cp2))
    assert(out.read.as[(Int, Long)].collect().toSet ===
      Set((1, 99L), (2, 20L)), "takeover merges the new stream's rows")
    // ... after which the ORIGINAL stream is the refused one
    t1.append(Seq((3, 30L)).toDF("k", "v"))
    assert(rootCauseMsg(intercept[Exception](run(src1, cp1)))
      .contains("owned by another sink"))
    // plain append sinks take no lease (concurrent appends are OCC-safe)
    val dst2 = tmpDir("ts-lease-dst2-")
    val qa = spark.readStream.format("graft-table").load(src1)
      .writeStream.format("graft-table")
      .option("checkpointLocation", tmpDir("ts-lease-cpA-"))
      .trigger(Trigger.AvailableNow()).start(dst2)
    qa.awaitTermination()
    assert(VersionedTable(spark, dst2).sinkOwner.isEmpty)
  }

  test("seeded random DML stress: the apply-changes replica AND the " +
       "aggregate sink both converge to the source after every round") {
    import org.apache.spark.sql.functions._
    val src = tmpDir("ts-rnd-src-")
    val rep = tmpDir("ts-rnd-rep-")
    val mv = tmpDir("ts-rnd-mv-")
    val cpR = tmpDir("ts-rnd-cpr-")
    val cpM = tmpDir("ts-rnd-cpm-")
    val t = VersionedTable(spark, src)
    t.enableChangeFeed()
    def rows(ids: Seq[Long], tag: String) =
      ids.map(i => (i, i % 7, s"$tag$i")).toDF("k", "g", "v")
    t.append(rows(0L until 60L, "a"))
    def syncBoth(): Unit = {
      val q1 = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(src)
        .writeStream.format("graft-table")
        .option("checkpointLocation", cpR)
        .option("mergeKeys", "k").option("applyChanges", "true")
        .option("numBuckets", "4")
        .trigger(Trigger.AvailableNow()).start(rep)
      q1.awaitTermination()
      val q2 = spark.readStream.format("graft-table")
        .option("readChangeFeed", "true").load(src)
        .writeStream.format("graft-table")
        .option("checkpointLocation", cpM)
        .option("mergeKeys", "g")
        .option("aggregate", "sum:k:sum_k;count:*:cnt;count:k:cnt_k")
        .option("numBuckets", "4")
        .trigger(Trigger.AvailableNow()).start(mv)
      q2.awaitTermination()
    }
    def assertConverged(round: String): Unit = {
      val want = t.read.select("k", "g", "v")
        .as[(Long, Long, String)].collect().toSet
      val got = VersionedTable(spark, rep).read.select("k", "g", "v")
        .as[(Long, Long, String)].collect().toSet
      assert(got === want, s"replica diverged after $round")
      val wantAgg = t.read.groupBy("g").agg(sum("k").as("sum_k"),
          count(lit(1)).as("cnt"), count("k").as("cnt_k"))
        .as[(Long, Long, Long, Long)].collect().toSet
      val gotAgg = VersionedTable(spark, mv).read
        .select("g", "sum_k", "cnt", "cnt_k")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(gotAgg === wantAgg, s"aggregate diverged after $round")
    }
    syncBoth(); assertConverged("bootstrap")
    val rnd = new scala.util.Random(42)
    var nextId = 1000L
    (0 until 8).foreach { r =>
      rnd.nextInt(5) match {
        case 0 => // fresh appends
          val ids = nextId until (nextId + 5 + rnd.nextInt(10))
          nextId = ids.last + 1
          t.append(rows(ids, s"r$r-"))
        case 1 => // merge: update a slice + insert new
          val upd = t.read.select("k").as[Long].collect()
            .filter(_ => rnd.nextBoolean()).take(8).toSeq
          val ins = Seq(nextId, nextId + 1); nextId += 2
          t.merge(rows(upd ++ ins, s"m$r-"), Seq("k"))
          ()
        case 2 => // predicate update
          t.update(Map("v" -> concat(col("v"), lit(s"!u$r"))),
            col("k") % 9 === (r % 9))
          ()
        case 3 => // predicate delete (may empty groups — the fold's
                  // emptied-group drop must match the recompute)
          t.delete(col("k") % 11 === (r % 11))
          ()
        case 4 => // replace_where: same-commit delete+insert per key
          val b = r % 5
          val keep = t.read.filter(col("k") % 5 === b)
            .select("k").as[Long].collect()
            .filter(_ => rnd.nextBoolean()).toSeq
          val fresh = Seq(nextId + 3 - (nextId + 3) % 5 + b); nextId += 10
          t.replaceWhere(col("k") % 5 === b,
            rows((keep ++ fresh).distinct.filter(_ % 5 == b), s"w$r-"))
          ()
      }
      syncBoth(); assertConverged(s"round $r")
    }
  }

  test("sink: splitMinPartitionSize un-coalesces THIS sink's staged " +
       "split (the trigger-latency knob); conf restores after the batch " +
       "and a bad value refuses at query start") {
    import org.apache.spark.sql.functions.{col, sha2}
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val key = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
    // drain the async listener bus deterministically (same reflective
    // seam Bench uses — waitUntilEmpty is private[spark], i.e. public
    // in bytecode); fallback sleep is fine at test granularity
    def drainBus(): Unit =
      try {
        val bus = spark.sparkContext.getClass.getMethod("listenerBus")
          .invoke(spark.sparkContext)
        bus.getClass.getMethods
          .find(m => m.getName == "waitUntilEmpty" &&
            m.getParameterCount == 1 &&
            m.getParameterTypes()(0) == java.lang.Long.TYPE)
          .fold(Thread.sleep(1000))(m =>
            { m.invoke(bus, java.lang.Long.valueOf(10000L)); () })
      } catch { case _: Throwable => Thread.sleep(1000) }
    // Max task count over ANY stage of one sink trigger. Streaming
    // masks inner callsites (every stage reports "start at …"), so the
    // staged-split stage can't be picked out by name — but it is the
    // ONLY AQE-coalesce-affected stage in the trigger: the json source
    // is one file, the shuffle map side mirrors it, and every metadata
    // job is single-task. A max > 1 can only come from the split's
    // un-coalesced reduce stage.
    def splitTasks(opt: Option[String]): Int = {
      val dst = tmpDir("ts-smps-dst-")
      val cp = tmpDir("ts-smps-cp-")
      val srcDir = tmpDir("ts-smps-in-") + "/landing"
      spark.range(4000).select(col("id").as("k"),
        sha2(col("id").cast("string"), 256).as("v"))
        .coalesce(1).write.json(srcDir)
      val confBefore = spark.conf.getOption(key)
      val counts = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
      val l = new SparkListener {
        override def onStageCompleted(
            sc: SparkListenerStageCompleted): Unit = {
          counts.add(sc.stageInfo.numTasks); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        val w = spark.readStream.schema("k BIGINT, v STRING").json(srcDir)
          .writeStream.format("graft-table")
          .option("checkpointLocation", cp)
          .option("mergeKeys", "k")
          .option("numBuckets", "16")
        val q = opt.fold(w)(v => w.option("splitMinPartitionSize", v))
          .trigger(Trigger.AvailableNow()).start(dst)
        q.awaitTermination()
        drainBus()
      } finally spark.sparkContext.removeSparkListener(l)
      // config-scoped write: the session conf is back exactly as it was
      assert(spark.conf.getOption(key) === confBefore,
        "splitMinPartitionSize must restore the session conf after the batch")
      assert(!counts.isEmpty, "no stage observed during the sink trigger")
      import scala.jdk.CollectionConverters._
      counts.asScala.map(_.intValue).max
    }
    // default: AQE coalesces the kilobyte-scale trigger to ONE task —
    // the adjudicated shared-cluster default (r16, ProfQ)
    assert(splitTasks(None) === 1,
      "default staged split should coalesce a tiny batch to one task")
    // the knob: a 1-byte floor keeps every non-empty shuffle partition
    // as its own task — the latency-critical deployment's trade
    assert(splitTasks(Some("1b")) > 1,
      "splitMinPartitionSize must fan the staged split back out")
    // a typo'd size refuses at query start, naming the option
    val e = intercept[Throwable] {
      spark.readStream.schema("k BIGINT, v STRING")
        .json(tmpDir("ts-smps-bad-"))
        .writeStream.format("graft-table")
        .option("checkpointLocation", tmpDir("ts-smps-badcp-"))
        .option("mergeKeys", "k")
        .option("splitMinPartitionSize", "lots")
        .trigger(Trigger.AvailableNow())
        .start(tmpDir("ts-smps-baddst-"))
    }
    val msg = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msg.contains("splitMinPartitionSize") && msg.contains("lots"),
      s"error must name the option and value: $msg")
  }
}
