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

  test("a non-append commit inside a batch range fails the stream loudly") {
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
    assert(e.getMessage.contains("append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-only")))
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
}
