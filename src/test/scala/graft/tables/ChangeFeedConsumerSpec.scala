package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Checkpointed pull-model CDF consumption ([[ChangeFeedConsumer]]):
  * position tracking, catch-up batching, and exactly-once downstream
  * maintenance under crash-replay. */
class ChangeFeedConsumerSpec extends SparkSpec {
  import spark.implicits._

  test("consumeAvailable advances a durable position across DML batches") {
    val src = VersionedTable(spark, tmpDir("cfc-src-"))
    src.enableChangeFeed()
    val cp = tmpDir("cfc-cp-")
    src.append(Seq((1, "a"), (2, "b")).toDF("k", "v"))     // v0
    var seen = Seq.empty[(Long, String, Int)]
    def collect(df: DataFrame, from: Long, to: Long): Unit =
      seen ++= df.select("_commit_version", "_change_type", "k")
        .as[(Long, String, Int)].collect().toSeq
    // bootstrap: full state as inserts
    assert(ChangeFeedConsumer.consumeAvailable(src, cp)(collect) ===
      Some((-1L, 0L)))
    assert(seen.toSet === Set((0L, "insert", 1), (0L, "insert", 2)))
    // caught up: no batch, f not invoked
    assert(ChangeFeedConsumer.consumeAvailable(src, cp)(collect) === None)
    // two more commits drain as ONE batch covering both versions
    src.merge(Seq((2, "b2"), (3, "c")).toDF("k", "v"), Seq("k"))  // v1
    src.delete(col("k") === 1)                                    // v2
    seen = Nil
    assert(ChangeFeedConsumer.consumeAvailable(src, cp)(collect) ===
      Some((0L, 2L)))
    assert(seen.map(_._1).toSet === Set(1L, 2L))
    assert(seen.count(_._2 == "delete") === 1)
  }

  test("txn-marker merges make crash-replay exactly-once") {
    val src = VersionedTable(spark, tmpDir("cfc-eo-src-"))
    src.enableChangeFeed()
    val mv = VersionedTable(spark, tmpDir("cfc-eo-mv-"))
    val cp = tmpDir("cfc-eo-cp-")
    src.append(Seq(("x", 10L), ("y", 5L)).toDF("grp", "amt"))
    mv.merge(Seq(("x", 0L), ("y", 0L)).toDF("grp", "total"), Seq("grp"),
      numBuckets = 2)
    def maintain(df: DataFrame, from: Long, to: Long): Unit = {
      val signed = df.withColumn("sgn",
        when(col("_change_type").isin("insert", "update_postimage"), 1L)
          .when(col("_change_type").isin("delete", "update_preimage"), -1L))
      val delta = signed.groupBy("grp")
        .agg(sum(col("sgn") * col("amt")).as("total"))
      // the txn marker is keyed on the range's `to` version: a replayed
      // batch is recognized from the ledger and skipped, not re-added
      mv.merge(delta, Seq("grp"),
        updateExprs = Map("total" -> ((t, u) => t + u)),
        txn = Some(("cfc-eo", to)))
    }
    assert(ChangeFeedConsumer.consumeAvailable(src, cp)(maintain).isDefined)
    assert(mv.read.as[(String, Long)].collect().toMap ===
      Map("x" -> 10L, "y" -> 5L))
    // simulate a crash AFTER the downstream effect, BEFORE the position
    // commit: wipe the position so the same range replays
    java.nio.file.Files.delete(java.nio.file.Paths.get(cp, "position"))
    assert(ChangeFeedConsumer.consumeAvailable(src, cp)(maintain) ===
      Some((-1L, 0L)))
    // replay recognized — totals NOT doubled
    assert(mv.read.as[(String, Long)].collect().toMap ===
      Map("x" -> 10L, "y" -> 5L))
    // a genuinely new change still applies
    src.append(Seq(("x", 7L)).toDF("grp", "amt"))
    ChangeFeedConsumer.consumeAvailable(src, cp)(maintain)
    assert(mv.read.as[(String, Long)].collect().toMap ===
      Map("x" -> 17L, "y" -> 5L))
  }

  test("drain batches until caught up") {
    val src = VersionedTable(spark, tmpDir("cfc-drain-"))
    src.enableChangeFeed()
    val cp = tmpDir("cfc-drain-cp-")
    src.append(Seq((1, "a")).toDF("k", "v"))
    var batches = 0
    assert(ChangeFeedConsumer.drain(src, cp)((_, _, _) => batches += 1) === 1)
    assert(batches === 1)
    assert(ChangeFeedConsumer.drain(src, cp)((_, _, _) => batches += 1) === 0)
  }
}
