package graft.tables

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** A snapshot-versioned parquet table: the engine's stand-in for the
  * reference's Delta tables (no Delta jars in this environment).
  *
  * Semantics modeled on the reference's table layer:
  *  - append-only bronze writes  (reference: `df.write.format("delta").mode("append")`,
  *    notebooks/01_bronze/11_ingest_fpl_bootstrap.py:151)
  *  - full overwrite publishes   (notebooks/03_silver/31_build_silver_dims.py:313-339)
  *  - MERGE upsert               (declared: notebooks/03_silver/32_merge_silver_live_event.sql,
  *    resources/uc/objects.sql:137-149)
  *  - time travel VERSION AS OF / TIMESTAMP AS OF (declared:
  *    notebooks/04_gold/45_time_travel_debug.sql, docs/backlog.md:55-58)
  *  - OPTIMIZE-style compaction  (resources/uc/objects.sql:25-28 autoOptimize)
  *
  * Layout (log-structured, O(1) append — appends write only new files, the
  * version log records which file-sets make up each snapshot, so this design
  * scales to arbitrarily large tables):
  * {{{
  *   <root>/data/<writeId>/part-*.parquet   // immutable file-sets, one dir per write
  *   <root>/_log/<%020d version>.json       // {version, tsMillis, action, fileSets:[...]}
  * }}}
  * Single-writer (matches the reference's `max_concurrent_runs: 1`,
  * resources/workflows/slice_v1_fpl_bootstrap.yml:5). Log commits are atomic
  * via write-temp-then-rename.
  */
final class VersionedTable(val spark: SparkSession, val root: String) {
  import VersionedTable._

  private def logDir: Path = Paths.get(root, "_log")
  private def dataDir: Path = Paths.get(root, "data")

  /** Glob covering every file-set dir — the path to hand a streaming
    * reader that must see ALL committed data, present and future (a
    * single file-set dir would silently miss later appends). */
  def dataGlob: String = dataDir.resolve("*").toString

  /** Files.list leaks its DirectoryStream unless closed; every directory
    * listing goes through here. */
  private def listDir(p: Path): Seq[Path] = {
    if (!Files.isDirectory(p)) return Seq.empty
    val s = Files.list(p)
    try s.iterator().asScala.toList finally s.close()
  }

  // ---------------------------------------------------------------- log I/O

  /** All committed log entries, ascending by version. */
  def history: Seq[LogEntry] = listDir(logDir)
    .filter(_.getFileName.toString.endsWith(".json"))
    .sortBy(_.getFileName.toString)
    .map(p => LogEntry.parse(Files.readString(p)))

  def latestVersion: Option[Long] = history.lastOption.map(_.version)

  private def commit(action: String, fileSets: Seq[String]): LogEntry = {
    val v = latestVersion.map(_ + 1).getOrElse(0L)
    val entry = LogEntry(v, System.currentTimeMillis(), action, fileSets)
    Files.createDirectories(logDir)
    val tmp = logDir.resolve(s".tmp-${UUID.randomUUID()}")
    Files.writeString(tmp, entry.toJson)
    Files.move(tmp, logDir.resolve(f"$v%020d.json"),
      StandardCopyOption.ATOMIC_MOVE)
    entry
  }

  private def writeFileSet(df: DataFrame, partitionBy: Seq[String] = Nil): String = {
    val id = UUID.randomUUID().toString
    val w = df.write.mode(SaveMode.ErrorIfExists)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(dataDir.resolve(id).toString)
    id
  }

  // ------------------------------------------------------------------ reads

  /** Current snapshot. Empty table → analysis error; guard with `exists`. */
  def read: DataFrame = readEntry(
    history.lastOption.getOrElse(sys.error(s"empty table at $root")))

  def exists: Boolean = history.nonEmpty

  /** `VERSION AS OF` (declared semantics: docs/backlog.md:55-58). */
  def readVersion(v: Long): DataFrame = readEntry(
    history.find(_.version == v)
      .getOrElse(sys.error(s"no version $v at $root")))

  /** `TIMESTAMP AS OF`: newest version committed at or before `tsMillis`. */
  def asOf(tsMillis: Long): DataFrame = readEntry(
    history.filter(_.tsMillis <= tsMillis).lastOption
      .getOrElse(sys.error(s"no version as of $tsMillis at $root")))

  /** Each file-set is scanned from its own root (required for hive-style
    * partition discovery — multiple roots in one scan conflict) and the
    * scans union. Predicate pushdown and partition pruning apply to every
    * union arm; `allowMissingColumns` tolerates additive schema evolution
    * across file-sets (M4). */
  private def readEntry(e: LogEntry): DataFrame =
    if (e.fileSets.isEmpty)
      spark.emptyDataFrame // overwrite-with-empty edge case
    else
      e.fileSets.map(f => spark.read.parquet(dataDir.resolve(f).toString))
        .reduce(_.unionByName(_, allowMissingColumns = true))

  // ----------------------------------------------------------------- writes

  /** Append-only write: O(new data), never rewrites existing files.
    * `partitionBy` (e.g. snapshot_date — the partitioning the reference
    * documents at docs/architecture.md:56 but never declares) lays the
    * file-set out hive-style so reads get partition pruning; all file-sets
    * of a table must use the same partitioning. */
  def append(df: DataFrame, partitionBy: Seq[String] = Nil): LogEntry = {
    val id = writeFileSet(df, partitionBy)
    commit("append", history.lastOption.map(_.fileSets).getOrElse(Nil) :+ id)
  }

  /** Full-snapshot replace (the reference's overwrite+overwriteSchema
    * publish). Old versions stay readable — time travel for free. */
  def overwrite(df: DataFrame, partitionBy: Seq[String] = Nil): LogEntry =
    commit("overwrite", Seq(writeFileSet(df, partitionBy)))

  /** MERGE upsert: update matched target rows with the update row, insert
    * unmatched updates, keep unmatched target rows. Rerun-idempotent
    * (merge twice ≡ merge once) as the reference requires for
    * silver.live_event (docs/backlog.md:49-51,75-78).
    *
    * Implemented as a key-outer join rewrite because no Delta jar is
    * present. At cluster scale both sides shuffle-partition on the merge
    * keys — the same data movement a Delta MERGE performs; updates are
    * deduplicated per key first (latest by `orderBy` wins) so the join is
    * 1:1 on the update side.
    */
  def merge(updates: DataFrame, keys: Seq[String],
            preferUpdateBy: Option[String] = None): LogEntry = {
    val dedupedUpdates = preferUpdateBy match {
      case Some(ord) => graft.ops.Keyed.latestPerKey(updates, keys, ord)
      case None      => updates.dropDuplicates(keys)
    }
    if (!exists) return overwrite(dedupedUpdates)
    val target = read
    val merged = graft.ops.Merge.upsert(target, dedupedUpdates, keys)
    commit("merge", Seq(writeFileSet(merged)))
  }

  /** OPTIMIZE-style small-file compaction: rewrite the current snapshot
    * into `numFiles` files as a new version. */
  def compact(numFiles: Int = 1): LogEntry =
    commit("compact", Seq(writeFileSet(read.coalesce(numFiles))))

  /** VACUUM: delete file-sets unreachable from the last `retainVersions`
    * versions (older versions stop being time-travelable, as with Delta
    * VACUUM). */
  def vacuum(retainVersions: Int = 1): Unit = {
    val h = history
    val keep = h.takeRight(retainVersions).flatMap(_.fileSets).toSet
    listDir(dataDir)
      .filterNot(p => keep.contains(p.getFileName.toString))
      .foreach(deleteRecursively)
  }

  private def deleteRecursively(p: Path): Unit = {
    listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}

object VersionedTable {
  def apply(spark: SparkSession, root: String): VersionedTable =
    new VersionedTable(spark, root)

  /** One version-log record. Minimal hand-rolled JSON (flat strings/longs
    * only) to avoid pulling a JSON dependency. */
  final case class LogEntry(version: Long, tsMillis: Long, action: String,
                            fileSets: Seq[String]) {
    def toJson: String = {
      val fs = fileSets.map(f => "\"" + f + "\"").mkString("[", ",", "]")
      s"""{"version":$version,"tsMillis":$tsMillis,"action":"$action","fileSets":$fs}"""
    }
  }
  object LogEntry {
    private val Pattern =
      """\{"version":(\d+),"tsMillis":(\d+),"action":"([^"]*)","fileSets":\[([^\]]*)\]\}""".r
    def parse(s: String): LogEntry = s.trim match {
      case Pattern(v, ts, a, fs) =>
        val sets =
          if (fs.isEmpty) Nil
          else fs.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
        LogEntry(v.toLong, ts.toLong, a, sets)
      case other => sys.error(s"bad log entry: $other")
    }
  }
}
