package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.streaming.Trigger

/** S9 — the WAL-backed micro-batch poller: fetch-once, land-first,
  * serve-from-WAL (see [[PollSource]]). */
class PollSourceSpec extends SparkSpec {
  import spark.implicits._

  private def drainOnce(wal: String, cp: String, fetcher: String,
                        out: scala.collection.mutable.Buffer[(Long, String)]): Unit = {
    val q = spark.readStream.format("graft-poll")
      .option("fetcher", fetcher).load(wal)
      .writeStream.option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        out ++= df.as[(Long, String)].collect(); ()
      }
      .start()
    q.awaitTermination()
  }

  test("polls land before offsets; restarts replay the WAL, never re-poll") {
    val wal = tmpDir("poll-wal-")
    val cp = tmpDir("poll-cp-")
    val calls = new AtomicInteger(0)
    PollSource.registerFetcher("t1", seq => {
      calls.incrementAndGet()
      if (seq < 3) Some(Seq(s"""{"n":$seq,"a":"x"}""", s"""{"n":$seq,"b":1}"""))
      else None
    })
    val got = scala.collection.mutable.Buffer.empty[(Long, String)]
    // each AvailableNow run triggers one poll: three data polls + one
    // empty one drain the fetcher
    (1 to 4).foreach(_ => drainOnce(wal, cp, "t1", got))
    assert(got.map(_._1).sorted === Seq(0L, 0L, 1L, 1L, 2L, 2L))
    assert(calls.get() === 4)
    // the WAL holds exactly one idempotently-named dir per sequence
    val dirs = new java.io.File(wal).listFiles().map(_.getName).sorted
    assert(dirs.toSeq === Seq("batch-000000", "batch-000001", "batch-000002"))
    // a FRESH checkpoint replays entirely from the WAL: same rows, and
    // the only fetch is the next-sequence probe (None) — landed
    // sequences are never re-polled
    val got2 = scala.collection.mutable.Buffer.empty[(Long, String)]
    drainOnce(wal, tmpDir("poll-cp2-"), "t1", got2)
    assert(got2.map(_._1).sorted === Seq(0L, 0L, 1L, 1L, 2L, 2L))
    assert(calls.get() === 5)
  }

  test("getBatch serves only (start, end] from landed files") {
    val wal = tmpDir("poll-wal2-")
    PollSource.registerFetcher("t2",
      seq => if (seq < 3) Some(Seq(s"p$seq")) else None)
    val src = new PollSource(spark, "t2", wal)
    (1 to 4).foreach(_ => src.getOffset) // land 0,1,2
    assert(src.getOffset === Some(LongOffset(2L)))
    // getBatch is landedBetween + the streaming flag; the batch core is
    // what a collect can execute
    assert(src.landedBetween(-1L, 2L).as[(Long, String)]
      .collect().toSet === Set((0L, "p0"), (1L, "p1"), (2L, "p2")))
    assert(src.landedBetween(0L, 1L)
      .as[(Long, String)].collect().toSeq === Seq((1L, "p1")))
    assert(src.getBatch(None, LongOffset(2L)).isStreaming)
    // unregistered fetcher fails loudly
    val ex = intercept[Exception](
      new PollSource(spark, "nope", wal).getOffset)
    assert(ex.getMessage.contains("no fetcher"))
  }

  test("transient fetch failures retry with backoff inside the trigger; " +
       "exhausted retries fail the query loudly; a retried fetch " +
       "cannot double-land its sequence") {
    val wal = tmpDir("poll-wal4-")
    val cp = tmpDir("poll-cp4-")
    val attempts = new AtomicInteger(0)
    // fails twice, then delivers — one page, then dry
    PollSource.registerFetcher("flaky", seq => {
      if (attempts.incrementAndGet() <= 2)
        sys.error(s"transient poll failure #${attempts.get()}")
      if (seq < 1) Some(Seq(s"p$seq")) else None
    })
    val got = scala.collection.mutable.Buffer.empty[(Long, String)]
    val q = spark.readStream.format("graft-poll")
      .option("fetcher", "flaky")
      .option("fetchRetries", "3").option("fetchBackoffMs", "1")
      .load(wal)
      .writeStream.option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df.as[(Long, String)].collect(); ()
      }
      .start()
    q.awaitTermination()
    assert(got.toSeq === Seq((0L, "p0")),
      "the in-trigger retry must deliver the page")
    assert(attempts.get() === 3, "2 failures + 1 success, all one trigger")
    // exactly one landed dir despite the retries — landing is
    // downstream of the one successful fetch
    assert(new java.io.File(wal).listFiles().map(_.getName).count(
      _.startsWith("batch-")) === 1)
    // a permanently dead endpoint exhausts the budget and fails LOUDLY
    PollSource.registerFetcher("dead", _ => sys.error("endpoint down"))
    val deadSrc = new PollSource(spark, "dead", tmpDir("poll-wal5-"),
      PollSource.RetryPolicy(fetchRetries = 2, fetchBackoffMs = 1))
    val ex = intercept[IllegalStateException](deadSrc.getOffset)
    assert(ex.getMessage.contains("after 3 attempt(s)"))
    // retries=0 → exactly one attempt, no silent absorption
    val n0 = new AtomicInteger(0)
    PollSource.registerFetcher("dead0", _ => {
      n0.incrementAndGet(); sys.error("down")
    })
    intercept[IllegalStateException](new PollSource(spark, "dead0",
      tmpDir("poll-wal6-"),
      PollSource.RetryPolicy(fetchRetries = 0)).getOffset)
    assert(n0.get() === 1)
  }

  test("payloads flow into a bronze table via from_json, exactly-once") {
    val wal = tmpDir("poll-wal3-")
    val cp = tmpDir("poll-cp3-")
    val dst = tmpDir("poll-dst-")
    PollSource.registerFetcher("t3",
      seq => if (seq < 2) Some(Seq(s"""{"event_id":$seq,"kind":"goal"}"""))
      else None)
    def pipe(): Unit = {
      val q = spark.readStream.format("graft-poll")
        .option("fetcher", "t3").load(wal)
        .selectExpr("poll_seq",
          "from_json(payload, 'event_id LONG, kind STRING') AS j")
        .select($"poll_seq", $"j.event_id", $"j.kind")
        .writeStream.format("graft-table")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start(dst)
      q.awaitTermination()
    }
    (1 to 3).foreach(_ => pipe())
    pipe() // replay: txn markers make it a no-op
    val t = graft.tables.VersionedTable(spark, dst)
    assert(t.read.select("event_id", "kind").as[(Long, String)]
      .collect().toSet === Set((0L, "goal"), (1L, "goal")))
  }
}
