package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL maintenance surface (docs/backlog.md:103-106, the reference's
  * empty notebooks/05_ops/61_optimize_and_maintenance.sql): parsed
  * `OPTIMIZE` / `VACUUM` statements alongside the existing
  * `DESCRIBE HISTORY` / `DESCRIBE DETAIL` relation flows, completing the
  * table lifecycle — DDL, DML, time travel, CDC, and now maintenance —
  * in one SQL entry point. Anything that is not a graft maintenance
  * statement delegates verbatim to `spark.sql`, so callers can use one
  * `GraftSql.sql(...)` funnel for their whole session (the same
  * parse-what-you-own / delegate-the-rest shape as Delta's SQL parser).
  *
  * Grammar (case-insensitive; `<table>` is `layer.table`,
  * `layer_table`, or an explicit path ``graft.`/abs/path` ``):
  *
  *   OPTIMIZE <table>                          -- bin-pack small file-sets
  *   OPTIMIZE <table> ZORDER BY (c1, c2, ...)  -- multi-column clustering
  *   OPTIMIZE <table> WHERE k = 'v' [AND ...]  -- one partition's cells only
  *   VACUUM <table> [RETAIN n VERSIONS] [DRY RUN]
  *   RESTORE TABLE <table> TO VERSION AS OF n
  *   RESTORE TABLE <table> TO TIMESTAMP AS OF 'yyyy-MM-dd HH:mm:ss'
  *   CREATE TABLE <table> SHALLOW CLONE <table>
  *   CONVERT TO GRAFT parquet.`/path` AS <table>   -- zero-copy adoption
  *   ANALYZE TABLE <table> COMPUTE STATISTICS FOR COLUMNS c1, c2, ...
  *   DESCRIBE HISTORY <table>
  *   DESCRIBE DETAIL <table>
  *
  * Retention is VERSION-based, not hour-based: the engine's time travel
  * is a version log, so `RETAIN 3 VERSIONS` is the honest analog of
  * Delta's `RETAIN n HOURS` (which gates on timestamps the test clock
  * can't control deterministically anyway).
  *
  * Scale notes. Bare OPTIMIZE is [[VersionedTable.compactSmall]] —
  * O(small files), the only form that is routine maintenance at 100 TB —
  * except on merge-bucketed tables, whose unit of maintenance is the
  * (partition, bucket) cell: those run [[VersionedTable.compact]], which
  * rewrites per-cell and preserves copy-on-write merge routing. The
  * small-file threshold comes from `spark.graft.optimize.smallFileBytes`
  * (default 128 MiB). VACUUM without DRY RUN deletes exactly what the
  * preview lists and returns the reclaimed count.
  */
final class GraftSql(spark: SparkSession, catalog: Option[Catalog]) {

  import GraftSql._

  /** One funnel: graft maintenance statements execute against the
    * resolved [[VersionedTable]]; everything else is `spark.sql`. */
  def sql(stmt: String): DataFrame = stmt match {
    case OptimizeWhereStmt(ident, preds) =>
      optimizePartition(resolve(ident), preds)
    case OptimizeStmt(ident, zcols) => optimize(resolve(ident), Option(zcols))
    case VacuumStmt(ident, retain, dry) =>
      vacuum(resolve(ident), Option(retain).map(_.toInt).getOrElse(1),
        dryRun = dry != null)
    case RestoreVersionStmt(ident, v) => restore(resolve(ident), _.restore(v.toLong))
    case RestoreTimestampStmt(ident, ts) =>
      restore(resolve(ident), _.restoreAsOf(parseTsUtc(ts)))
    case CloneStmt(target, source) => clone(resolve(source), targetRoot(target))
    case ConvertStmt(srcDir, target) => convert(srcDir, targetRoot(target))
    // ANALYZE is the one owned statement that is ALSO valid vanilla
    // Spark SQL — an identifier that isn't a graft table (unknown layer,
    // no catalog bound, not found) delegates instead of erroring, so the
    // funnel keeps its parse-what-you-own contract for catalog tables
    // and temp views
    case AnalyzeStmt(ident, cols) =>
      scala.util.Try(resolve(ident)).toOption
        .fold(spark.sql(stmt))(analyze(_, cols))
    case DescHistoryStmt(ident) => resolve(ident).historyDf
    case DescDetailStmt(ident)  => resolve(ident).detailDf
    case other => spark.sql(other)
  }

  private def convert(srcDir: String, target: String): DataFrame = {
    import spark.implicits._
    val t = new VersionedTable(spark, target)
    val e = t.convertFrom(srcDir)
    Seq((e.action, e.version, e.fileSets.length.toLong))
      .toDF("operation", "version", "n_file_sets")
  }

  private def analyze(tbl: VersionedTable, cols: String): DataFrame = {
    import spark.implicits._
    val names = cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
      .filter(_.nonEmpty).toSeq
    Seq(tbl.computeStats(names).toLong).toDF("n_file_sets_analyzed")
  }

  private def clone(src: VersionedTable, target: String): DataFrame = {
    import spark.implicits._
    val t = src.shallowCloneTo(target)
    val e = t.history.last
    Seq((e.action, src.latestVersion.getOrElse(-1L),
        e.fileSets.length.toLong))
      .toDF("operation", "source_version", "n_file_sets")
  }

  private def optimize(tbl: VersionedTable, zcols: Option[String]): DataFrame = {
    import spark.implicits._
    val before = tbl.history.lastOption.getOrElse(
      sys.error(s"OPTIMIZE: empty table at ${tbl.root}"))
    val entry = zcols match {
      case Some(cs) =>
        tbl.compactZOrder(cs.split(",").map(_.trim.stripPrefix("`")
          .stripSuffix("`")).filter(_.nonEmpty).toSeq)
      case None if tbl.bucketSpec.isDefined => tbl.compact()
      case None => tbl.compactSmall(spark.conf
        .getOption(SmallFileBytesConf).map(_.toLong)
        .getOrElse(DefaultSmallFileBytes))
    }
    Seq((entry.action, before.version, entry.version,
        before.fileSets.length.toLong, entry.fileSets.length.toLong))
      .toDF("operation", "version_before", "version_after",
        "file_sets_before", "file_sets_after")
  }

  /** `OPTIMIZE … WHERE` — Delta's partition-scoped compaction: only the
    * named partition's cells rewrite, O(one partition) not O(table).
    * The predicate must name exactly the table's partition keys with
    * `=` equalities (anything else cannot map to a partition tuple —
    * fail loudly rather than silently over- or under-compact). */
  private def optimizePartition(tbl: VersionedTable,
                                preds: String): DataFrame = {
    import spark.implicits._
    val before = tbl.history.lastOption.getOrElse(
      sys.error(s"OPTIMIZE: empty table at ${tbl.root}"))
    val partKeys = tbl.bucketSpec.map(_.partitionKeys).getOrElse(Nil)
    require(partKeys.nonEmpty,
      s"OPTIMIZE … WHERE needs a partitioned bucketed table at ${tbl.root}")
    val kvs = preds.split("(?i)\\s+AND\\s+").map { p =>
      p.split("=", 2) match {
        case Array(k, v) =>
          k.trim.stripPrefix("`").stripSuffix("`") ->
            v.trim.stripPrefix("'").stripSuffix("'")
        case _ => sys.error(s"OPTIMIZE WHERE: not an equality: $p")
      }
    }.toMap
    require(kvs.keySet == partKeys.toSet,
      s"OPTIMIZE WHERE must name exactly the partition keys " +
        s"${partKeys.mkString(", ")} (got ${kvs.keys.mkString(", ")})")
    val entry = tbl.compactPartitions(Seq(partKeys.map(kvs)))
    Seq((entry.action, before.version, entry.version,
        before.fileSets.length.toLong, entry.fileSets.length.toLong))
      .toDF("operation", "version_before", "version_after",
        "file_sets_before", "file_sets_after")
  }

  private def restore(tbl: VersionedTable,
                      run: VersionedTable => VersionedTable.LogEntry): DataFrame = {
    import spark.implicits._
    val before = tbl.latestVersion.getOrElse(
      sys.error(s"RESTORE: empty table at ${tbl.root}"))
    val entry = run(tbl)
    Seq((entry.action, before, entry.version))
      .toDF("operation", "version_before", "version_after")
  }

  /** The session clock is pinned UTC (every entry point sets
    * `spark.sql.session.timeZone=UTC`), so RESTORE's timestamp literal
    * parses in UTC too — `Timestamp.valueOf` would silently shift by the
    * JVM default zone. */
  private def parseTsUtc(ts: String): Long = {
    val t = ts.trim
    val ldt =
      if (t.contains(" ") || t.contains("T"))
        java.time.LocalDateTime.parse(t.replace(' ', 'T'))
      else java.time.LocalDate.parse(t).atStartOfDay // date-only literal
    ldt.atZone(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
  }

  private def vacuum(tbl: VersionedTable, retain: Int,
                     dryRun: Boolean): DataFrame = {
    import spark.implicits._
    require(retain >= 1, s"VACUUM: RETAIN $retain VERSIONS (must be >= 1)")
    if (dryRun)
      tbl.vacuumDryRun(retainVersions = retain).toDF("path").orderBy("path")
    else {
      // one listing: vacuum() reports what it actually deleted, so
      // n_reclaimed can't drift from the deletes under concurrency
      // (and the directory walk + history parse happen once, not twice)
      val deleted = tbl.vacuum(retainVersions = retain)
      Seq(deleted.length.toLong).toDF("n_reclaimed")
    }
  }

  /** The ONE identifier grammar: `layer.table` / `layer_table` via the
    * catalog, or ``graft.`path` `` opening the path directly (Delta's
    * ``delta.`path` `` form). Returns the table's root path without an
    * existence check — a clone/convert TARGET doesn't exist yet (and
    * [[VersionedTable.shallowCloneTo]]/[[VersionedTable.convertFrom]]
    * themselves refuse an already-versioned target). */
  private def targetRoot(ident: String): String = ident match {
    case PathIdent(path) => path
    case other =>
      val cat = catalog.getOrElse(sys.error(
        s"no catalog bound: use graft.`<path>` to address $other"))
      other.split("[._]", 2) match {
        case Array(layer, name) if cat.Layers.contains(layer.toLowerCase) =>
          cat.table(layer.toLowerCase, name).root
        case _ => sys.error(s"cannot resolve table identifier: $other " +
          s"(expected <layer>.<table>, <layer>_<table>, or graft.`<path>`)")
      }
  }

  /** [[targetRoot]] plus the existence check every non-creating
    * statement wants (explicit-path idents skip it, matching the
    * relation read surfaces — an empty path errors in the statement's
    * own empty-table guard with a better message). */
  private def resolve(ident: String): VersionedTable = ident match {
    case PathIdent(path) => VersionedTable(spark, path)
    case other =>
      val tbl = VersionedTable(spark, targetRoot(other))
      if (!tbl.exists) sys.error(s"table not found: $other")
      tbl
  }
}

object GraftSql {
  val SmallFileBytesConf = "spark.graft.optimize.smallFileBytes"
  val DefaultSmallFileBytes: Long = 128L * 1024 * 1024

  def apply(spark: SparkSession, catalog: Catalog): GraftSql =
    new GraftSql(spark, Some(catalog))
  def apply(spark: SparkSession): GraftSql = new GraftSql(spark, None)

  // Identifier: a backticked explicit path, or a dotted/underscored name.
  private val Ident = """(graft\.`[^`]+`|[\w.]+)"""
  private val OptimizeWhereStmt =
    ("""(?is)\s*OPTIMIZE\s+""" + Ident +
      """\s+WHERE\s+(.+?)\s*;?\s*""").r
  private val OptimizeStmt =
    ("""(?is)\s*OPTIMIZE\s+""" + Ident +
      """(?:\s+ZORDER\s+BY\s*\(([^)]*)\))?\s*;?\s*""").r
  private val RestoreVersionStmt =
    ("""(?is)\s*RESTORE\s+TABLE\s+""" + Ident +
      """\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""").r
  private val RestoreTimestampStmt =
    ("""(?is)\s*RESTORE\s+TABLE\s+""" + Ident +
      """\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""").r
  private val CloneStmt =
    ("""(?is)\s*CREATE\s+TABLE\s+""" + Ident +
      """\s+SHALLOW\s+CLONE\s+""" + Ident + """\s*;?\s*""").r
  private val ConvertStmt =
    ("""(?is)\s*CONVERT\s+TO\s+GRAFT\s+parquet\.`([^`]+)`\s+AS\s+""" +
      Ident + """\s*;?\s*""").r
  private val AnalyzeStmt =
    ("""(?is)\s*ANALYZE\s+TABLE\s+""" + Ident +
      """\s+COMPUTE\s+STATISTICS\s+FOR\s+COLUMNS\s+([\w`,\s]+?)\s*;?\s*""").r
  private val VacuumStmt =
    ("""(?is)\s*VACUUM\s+""" + Ident +
      """(?:\s+RETAIN\s+(\d+)\s+VERSIONS?)?(\s+DRY\s+RUN)?\s*;?\s*""").r
  private val DescHistoryStmt =
    ("""(?is)\s*DESC(?:RIBE)?\s+HISTORY\s+""" + Ident + """\s*;?\s*""").r
  private val DescDetailStmt =
    ("""(?is)\s*DESC(?:RIBE)?\s+DETAIL\s+""" + Ident + """\s*;?\s*""").r
  private val PathIdent = """graft\.`([^`]+)`""".r
}
