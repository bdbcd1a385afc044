package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graft.StreamShim
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** S9 — the reference's micro-batch poller re-expressed Spark-first
  * (docs/backlog.md:63-69; the empty notebooks/01_bronze/
  * 12_poll_live_events.py + 13_land_live_events_files.py): poll an
  * endpoint once per micro-batch, LAND the raw payload batch under an
  * idempotent name FIRST, then serve the batch from the landing — the
  * reference's "append raw payloads + land files with idempotent names
  * (run_id+seq)" contract.
  *
  *   PollSource.registerFetcher("live", seq => fetchPage(seq))
  *   spark.readStream.format("graft-poll")
  *     .option("fetcher", "live").load(walDir)
  *
  * The TRANSPORT is a pluggable `Long => Option[Seq[String]]` — one poll
  * sequence number in, raw payload strings (or None for "nothing new")
  * out. HTTP deliberately lives OUTSIDE the engine (SURVEY §2.1: the
  * endpoint client is harness-side; this container has no egress) —
  * tests and drivers register deterministic fetchers, production wires
  * an HTTP client in the same two lines.
  *
  * '''Why land-then-serve is the whole design.''' A network poll is not
  * replayable: a checkpoint replay that re-fetched would see different
  * data (or none), silently breaking exactly-once. Landing each batch
  * as `batch-%06d` parquet BEFORE its offset is observable makes the
  * WAL the replay source: getBatch reads ONLY landed files, a restart
  * re-reads the WAL and never re-polls a landed sequence, and the next
  * poll resumes at the first unlanded sequence. A crash between landing
  * and offset-commit leaves a complete landed batch that the next
  * trigger simply serves — at-most-one fetch per sequence, exactly-once
  * delivery downstream. Scale: each micro-batch reads O(new payloads);
  * the WAL grows by arrival rate and is ordinary parquet (vacuumable by
  * retention jobs like any landing folder).
  */
final class PollSource(spark: SparkSession, fetcherName: String,
                       walDir: String,
                       retry: PollSource.RetryPolicy =
                         PollSource.RetryPolicy()) extends Source {

  private val root = Paths.get(walDir)
  // 6+ digits: %06d grows past sequence 999999 — an anchored {6} would
  // stall the source forever at 1e6 (offset never advances, every
  // trigger re-fetches and discards the same page)
  private val BatchName = """batch-(\d{6,})""".r

  private def landedSeqs: Seq[Long] = {
    if (!Files.isDirectory(root)) return Nil
    val s = Files.list(root)
    try s.iterator().asScala.flatMap(p => p.getFileName.toString match {
      case BatchName(n) => Some(n.toLong)
      case _            => None
    }).toList.sorted
    finally s.close()
  }

  override val schema: StructType = PollSource.Schema

  /** Poll once, land durably, then expose the newest landed sequence as
    * the offset — the offset is only ever derived from the WAL. */
  override def getOffset: Option[V1Offset] = {
    val fetch = PollSource.fetcher(fetcherName)
    val next = landedSeqs.lastOption.map(_ + 1).getOrElse(0L)
    fetchWithRetry(fetch, next).filter(_.nonEmpty).foreach(land(next, _))
    landedSeqs.lastOption.map(LongOffset(_))
  }

  /** The backlog's "backoff + retry strategy" (docs/backlog.md:67): a
    * TRANSIENT fetch failure retries in-trigger — up to
    * `fetchRetries` extra attempts, exponentially backed off from
    * `fetchBackoffMs` and capped at `fetchBackoffMaxMs` — before
    * failing the query loudly (a permanently dead endpoint must not be
    * silently absorbed as "nothing new" forever). Retrying is safe by
    * construction: only the FETCH replays; landing stays downstream of
    * one successful fetch, and the idempotent `batch-%06d` rename means
    * even a fetch whose previous attempt DID land (crash between land
    * and offset, concurrent trigger) cannot double-land its sequence.
    * The backoff sleeps the driver's micro-batch planning thread —
    * exactly the thread that must not advance while the poll is down. */
  private def fetchWithRetry(fetch: Long => Option[Seq[String]],
                             seq: Long): Option[Seq[String]] = {
    var attempt = 0
    while (true) {
      try return fetch(seq)
      catch {
        case scala.util.control.NonFatal(e) =>
          if (attempt >= retry.fetchRetries)
            throw new IllegalStateException(
              s"graft-poll: fetch of sequence $seq failed after " +
                s"${attempt + 1} attempt(s)", e)
          // 1L<<attempt with a shift guard — no overflow at high caps
          val factor = 1L << math.min(attempt, 30)
          Thread.sleep(math.min(retry.fetchBackoffMaxMs,
            retry.fetchBackoffMs * factor))
          attempt += 1
      }
    }
    None // unreachable
  }

  private def land(seq: Long, payloads: Seq[String]): Unit = {
    import spark.implicits._
    Files.createDirectories(root)
    val tmp = root.resolve(s".tmp-${UUID.randomUUID()}")
    payloads.toDF("payload").select(lit(seq).as("poll_seq"), col("payload"))
      .coalesce(1).write.parquet(tmp.toString)
    // idempotent name: a concurrent/replayed lander of the SAME sequence
    // loses the move and its staging is discarded — one landing per seq
    try Files.move(tmp, root.resolve(f"batch-$seq%06d"))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        deleteRecursively(tmp)
    }
  }

  /** The WAL rows of sequences in (lo, hi] as a BATCH frame — the
    * testable core of [[getBatch]]. */
  private[streaming] def landedBetween(lo: Long, hi: Long): DataFrame = {
    val dirs = landedSeqs.filter(s => s > lo && s <= hi)
      .map(s => root.resolve(f"batch-$s%06d").toString)
    val df =
      if (dirs.isEmpty)
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          PollSource.Schema)
      else spark.read.schema(PollSource.Schema).parquet(dirs: _*)
    df.select("poll_seq", "payload")
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame =
    StreamShim.asStreaming(landedBetween(
      start.map(_.json.toLong).getOrElse(-1L), end.json.toLong))

  private def deleteRecursively(p: Path): Unit =
    graft.tables.VersionedTable.deleteRecursively(p)

  override def stop(): Unit = ()
}

object PollSource {
  /** Per-trigger fetch retry policy
    * (`.option("fetchRetries"/"fetchBackoffMs"/"fetchBackoffMaxMs", …)`):
    * `fetchRetries` EXTRA attempts after the first failure, exponential
    * backoff from `fetchBackoffMs` doubling per attempt, capped at
    * `fetchBackoffMaxMs`. */
  final case class RetryPolicy(fetchRetries: Int = 3,
                               fetchBackoffMs: Long = 100L,
                               fetchBackoffMaxMs: Long = 10000L) {
    require(fetchRetries >= 0 && fetchBackoffMs >= 0 &&
      fetchBackoffMaxMs >= fetchBackoffMs,
      s"bad poll retry policy: retries=$fetchRetries " +
        s"backoff=$fetchBackoffMs max=$fetchBackoffMaxMs")
  }

  /** Raw landing schema, the reference's bronze payload shape: the poll
    * sequence (idempotency key half) + the raw payload string;
    * downstream parses with from_json exactly like the file-stream
    * bronze path (S8). */
  val Schema: StructType = StructType(Seq(
    StructField("poll_seq", LongType, nullable = false),
    StructField("payload", StringType, nullable = true)))

  private val fetchers =
    new java.util.concurrent.ConcurrentHashMap[
      String, Long => Option[Seq[String]]]()

  /** Register the transport under a name referenced by
    * `.option("fetcher", name)`. Re-registering replaces (tests). */
  def registerFetcher(name: String,
                      f: Long => Option[Seq[String]]): Unit = {
    fetchers.put(name, f); ()
  }

  private[streaming] def fetcher(name: String): Long => Option[Seq[String]] =
    Option(fetchers.get(name)).getOrElse(
      sys.error(s"graft-poll: no fetcher registered under '$name' — call " +
        "PollSource.registerFetcher first"))
}

/** `spark.readStream.format("graft-poll")` provider. */
final class PollSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-poll"

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), PollSource.Schema)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val dflt = PollSource.RetryPolicy()
    new PollSource(sqlContext.sparkSession,
      parameters.getOrElse("fetcher",
        sys.error("graft-poll needs .option(\"fetcher\", <registered name>)")),
      parameters.getOrElse("path",
        sys.error("graft-poll: .load(<WAL dir>) is required")),
      PollSource.RetryPolicy(
        parameters.get("fetchRetries").map(_.toInt)
          .getOrElse(dflt.fetchRetries),
        parameters.get("fetchBackoffMs").map(_.toLong)
          .getOrElse(dflt.fetchBackoffMs),
        parameters.get("fetchBackoffMaxMs").map(_.toLong)
          .getOrElse(dflt.fetchBackoffMaxMs)))
  }
}
