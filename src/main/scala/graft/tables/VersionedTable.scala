package graft.tables

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
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
  *  - DESCRIBE HISTORY as a relation (docs/backlog.md:55-58) via [[historyDf]]
  *
  * Layout (log-structured, O(1) append — appends write only new files, the
  * version log records which file-sets make up each snapshot, so this design
  * scales to arbitrarily large tables):
  * {{{
  *   <root>/data/<writeId>/part-*.parquet   // immutable file-sets, one dir per write
  *   <root>/data/<writeId>.b<k>/...         // bucketed file-set: bucket k only
  *   <root>/_log/<%020d version>.json       // {version, tsMillis, action, fileSets:[...]}
  *   <root>/_bucketspec.json                // optional {keys, numBuckets}
  * }}}
  *
  * '''Copy-on-write MERGE.''' A merged table is hash-bucketed on its merge
  * keys: every file-set covers exactly one of `numBuckets` key-hash buckets
  * (the bucket id is part of the file-set name, so the log format is
  * unchanged). `merge` computes the buckets its update keys land in, reads
  * and rewrites ONLY those buckets' file-sets, and carries every untouched
  * file-set into the new log entry verbatim — the same touched-files-only
  * write Delta's MERGE performs. Per micro-batch cost is
  * O(table / numBuckets × touched buckets), not O(table): at 100 TB with
  * 4096 buckets, a batch touching 3 buckets rewrites ~75 GB, not 100 TB.
  *
  * Single-writer (matches the reference's `max_concurrent_runs: 1`,
  * resources/workflows/slice_v1_fpl_bootstrap.yml:5). Log commits are atomic
  * via write-temp-then-rename.
  */
final class VersionedTable(val spark: SparkSession, val root: String) {
  import VersionedTable._

  private def logDir: Path = Paths.get(root, "_log")
  private def dataDir: Path = Paths.get(root, "data")
  private def stagingDir: Path = Paths.get(root, "_staging")
  private def specPath: Path = Paths.get(root, "_bucketspec.json")

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

  /** DESCRIBE HISTORY as a relation (docs/backlog.md:55-58): one row per
    * committed version, queryable/joinable like any DataFrame. */
  def historyDf: DataFrame = {
    import spark.implicits._
    history
      .map(e => (e.version, new java.sql.Timestamp(e.tsMillis), e.action,
        e.fileSets.length.toLong))
      .toDF("version", "commit_ts", "action", "n_file_sets")
  }

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

  // ------------------------------------------------------------ bucket spec

  /** Key-hash bucketing spec, if this table is merge-bucketed. Established
    * by the first `merge` and immutable afterwards. */
  def bucketSpec: Option[BucketSpec] =
    if (Files.exists(specPath)) Some(BucketSpec.parse(Files.readString(specPath)))
    else None

  private def writeSpec(s: BucketSpec): Unit = {
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, s".tmp-spec-${UUID.randomUUID()}")
    Files.writeString(tmp, s.toJson)
    Files.move(tmp, specPath, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Bucket id a file-set covers, if it is a bucketed file-set. */
  private def bucketOf(fileSet: String): Option[Int] = fileSet match {
    case BucketedName(k) => Some(k.toInt)
    case _               => None
  }

  private def bucketExpr(spec: BucketSpec) =
    pmod(hash(spec.keys.map(col): _*), lit(spec.numBuckets))

  // ----------------------------------------------------------------- writes

  /** File-set ids carry a fingerprint of the written schema
    * (`<uuid>.s<8 hex>`): reads group same-schema file-sets into one
    * multi-path scan WITHOUT touching parquet footers — a 10k-append
    * table plans with zero per-file-set metadata reads instead of 10k
    * driver-side footer fetches. */
  private def schemaTag(df: DataFrame): String =
    // first 8 hex of SHA-256: String.hashCode collides trivially
    // ("Aa" vs "BB"), and a tag collision would silently fold two schema
    // generations into one scan that drops the evolved columns
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(df.schema.json.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString

  /** All writes stage under `_staging/` and rename into `data/` when
    * complete (atomic dir move on one filesystem): a crashed writer can
    * never leave a partial file-set where `dataGlob` streaming readers or
    * glob expansion would see it — `data/` only ever contains finished
    * file-sets. */
  private def writeFileSet(df: DataFrame, partitionBy: Seq[String] = Nil): String = {
    val id = s"${UUID.randomUUID().toString}.s${schemaTag(df)}"
    Files.createDirectories(dataDir)
    val w = df.write.mode(SaveMode.ErrorIfExists)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(stagingDir.resolve(id).toString)
    Files.move(stagingDir.resolve(id), dataDir.resolve(id))
    id
  }

  /** Write `df` as one file-set PER key-hash bucket it populates. One job:
    * a single partitioned write into a staging dir (repartitioned so each
    * bucket lands in one task → ~one file per bucket), then each bucket dir
    * is renamed out as its own immutable file-set. The bucket column lives
    * only in the dir name — the parquet schema is untouched. */
  private def writeBucketedFileSets(df: DataFrame, spec: BucketSpec): Seq[String] =
    writeSplitFileSets(df,
      layout = d => d.withColumn(BucketCol, bucketExpr(spec))
        .repartition(spec.numBuckets, col(BucketCol)),
      nameFor = (id, tag, k) => f"$id.s$tag.b$k%05d",
      // empty-input fallback must still carry the bucket tag so later
      // merges keep treating the table as fully bucketed (COW routing)
      emptyName = fid => f"$fid.b${0}%05d")

  /** One file-set per contiguous key range: range-repartition on `key`;
    * the range id lives only in the dir name ([[writeSplitFileSets]]).
    * No `.b` suffix: a range file-set is NOT a hash bucket. */
  private def writeRangeFileSets(df: DataFrame, key: Column, n: Int): Seq[String] =
    writeSplitFileSets(df,
      layout = d => d.withColumn("__zkey", key)
        .repartitionByRange(n, col("__zkey"))
        .withColumn(BucketCol, spark_partition_id())
        .drop("__zkey"),
      nameFor = (id, tag, k) => f"$id-z$k%05d.s$tag",
      emptyName = identity)

  /** Shared split-write protocol: ONE dynamic-partition job into staging
    * (partitioned on [[BucketCol]], which `layout` must add), then each
    * partition dir is renamed out as its own immutable file-set named by
    * `nameFor(writeId, schemaTag, partitionId)`. The partition column
    * lives only in the dir name — the parquet schema is untouched. An
    * EMPTY input emits no partition dirs, which would commit a
    * schema-LESS snapshot; it degenerates to one schema-bearing empty
    * file-set renamed through `emptyName`. */
  private def writeSplitFileSets(df: DataFrame,
                                 layout: DataFrame => DataFrame,
                                 nameFor: (String, String, Int) => String,
                                 emptyName: String => String): Seq[String] = {
    val id = UUID.randomUUID().toString
    val staging = stagingDir.resolve(id)
    Files.createDirectories(dataDir)
    val tag = schemaTag(df)
    layout(df)
      .write.mode(SaveMode.ErrorIfExists)
      .partitionBy(BucketCol)
      .parquet(staging.toString)
    val ids = listDir(staging)
      .filter(_.getFileName.toString.startsWith(s"$BucketCol="))
      .map { p =>
        val k = p.getFileName.toString.stripPrefix(s"$BucketCol=").toInt
        val fsId = nameFor(id, tag, k)
        Files.move(p, dataDir.resolve(fsId))
        fsId
      }
    deleteRecursively(staging) // leftover _SUCCESS marker
    if (ids.nonEmpty) ids.sorted
    else {
      val fid = writeFileSet(df)
      val renamed = emptyName(fid)
      if (renamed != fid) Files.move(dataDir.resolve(fid), dataDir.resolve(renamed))
      Seq(renamed)
    }
  }

  /** OPTIMIZE ZORDER BY analog (Delta's multi-dimensional clustering):
    * rewrite the current snapshot clustered on the Morton key of `cols`
    * (numeric columns), split into `numFileSets` contiguous key ranges,
    * each with min/max stats sidecars on every z-ordered column — after
    * this, [[readRange]] on ANY of `cols` skips most file-sets, not just
    * on one leading sort key (a linear sort clusters only its first
    * column). Bucket cuts are equi-depth per column (driver-side
    * approxQuantile, one pass), so skewed columns still spread across the
    * full bucket space. The Morton key itself is a custom expression —
    * one tight loop per row, no per-row driver work. */
  def compactZOrder(cols: Seq[String], numFileSets: Int = 16,
                    bitsPerCol: Int = 8): LogEntry = {
    require(cols.nonEmpty, "compactZOrder needs at least one column")
    require(bucketSpec.isEmpty,
      s"merge-bucketed table at $root is laid out by key hash; " +
        "z-ordering would break copy-on-write merge routing")
    val snap = read
    val nCuts = (1 << bitsPerCol) - 1
    val probs = (1 to nCuts).map(_.toDouble / (nCuts + 1)).toArray
    val cuts: Array[Array[Double]] = cols.map(c =>
      snap.stat.approxQuantile(c, probs, 0.001).distinct.sorted).toArray
    // per-call function registration (closure carries the cuts), bounded
    // by the shared registrar so looped compactions don't leak entries
    val fname = s"graft_zorder_${UUID.randomUUID().toString.replace("-", "")}"
    graft.functions.TransientFunctions.register(spark, "graft_zorder", fname,
      classOf[graft.functions.ZOrderKey],
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.ZOrderKey(exprs, cuts, bitsPerCol))
    val zkey = call_function(fname, cols.map(c => col(c).cast("double")): _*)
    val ids = writeRangeFileSets(snap, zkey, numFileSets)
    writeStatsSidecars(ids, cols)
    commit("zorder", ids)
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

  /** Incremental consumption for append-only feeds (the change-feed-lite
    * a downstream batch consumer needs): exactly the rows added after
    * version `v`, read from the file-sets that version `v` did not have —
    * O(new data), the table's size is irrelevant. Valid only while every
    * action after `v` is an append; compact/overwrite/merge rewrite
    * file-sets, so the diff would misreport — those histories error and
    * the caller falls back to a full re-read. */
  def readAddedSince(v: Long): DataFrame = {
    val h = history
    val base = h.find(_.version == v)
      .getOrElse(sys.error(s"no version $v at $root"))
    val later = h.filter(_.version > v)
    require(later.forall(_.action == "append"),
      s"readAddedSince needs append-only history after v$v at $root; " +
        s"saw ${later.map(_.action).distinct.mkString(",")} — re-read the snapshot")
    val baseSets = base.fileSets.toSet
    val newSets = h.lastOption.map(_.fileSets).getOrElse(Nil)
      .filterNot(baseSets.contains)
    if (newSets.isEmpty) read.limit(0) else readFileSets(newSets)
  }

  private def readEntry(e: LogEntry): DataFrame =
    if (e.fileSets.isEmpty) spark.emptyDataFrame // overwrite-with-empty edge
    else readFileSets(e.fileSets)

  /** Union-arm folding: flat (non-hive-partitioned) file-sets with the same
    * schema collapse into ONE multi-path parquet scan, so a table with 10k
    * appends plans a single scan node, not a 10k-arm union. Scans still
    * union across:
    *  - schema generations (multi-path reads silently take the first file's
    *    schema, so mixing them would drop evolved columns — M4), and
    *  - hive-partitioned file-sets (multiple partitioned roots conflict in
    *    one scan; each keeps its own root for partition discovery/pruning).
    * Grouping keys on the schema fingerprint embedded in the file-set NAME
    * — zero metadata IO; legacy untagged file-sets fall back to one
    * parquet footer read each. */
  private def readFileSets(fileSets: Seq[String]): DataFrame = {
    val paths = fileSets.map(f => dataDir.resolve(f))
    val (partitioned, flat) = paths.partition(hasHivePartitionDirs)
    val flatScans = flat
      .groupBy { p =>
        p.getFileName.toString match {
          case SchemaTagged(tag) => tag
          case _ => spark.read.parquet(p.toString).schema.json // legacy
        }
      }
      .toSeq.sortBy(_._2.head.getFileName.toString) // deterministic plan
      .map { case (_, ps) => spark.read.parquet(ps.map(_.toString): _*) }
    val scans = flatScans ++ partitioned.map(p => spark.read.parquet(p.toString))
    scans.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  private def hasHivePartitionDirs(p: Path): Boolean =
    listDir(p).exists(d => Files.isDirectory(d) &&
      d.getFileName.toString.contains("="))

  // ------------------------------------------------------- file-set stats

  /** Delta-style data skipping: per-file-set min/max of declared columns,
    * written as a sidecar at append time (one tiny agg over the NEW
    * file-set only — O(new data)), consumed by [[readRange]] to prune
    * whole file-sets without opening them. Values are URL-encoded so any
    * string content round-trips; numeric columns compare numerically,
    * everything else lexically (correct for ISO dates/timestamps). */
  /** One grouped pass over ALL the new file-sets (they share a schema —
    * written together): min/max per (file-set, column) from a single job
    * instead of one read+agg+collect per bucket file-set. */
  private def writeStatsSidecars(fileSets: Seq[String], statsFor: Seq[String]): Unit = {
    if (statsFor.isEmpty || fileSets.isEmpty) return
    val paths = fileSets.map(fs => dataDir.resolve(fs).toString)
    // file-set id = the path segment right after THIS table's data dir —
    // anchored to the absolute dataDir path, not the first "/data/"
    // segment anywhere in the path (a table rooted under e.g.
    // /mnt/data/wh/tbl would otherwise capture "wh" and every sidecar
    // write would miss its file-set)
    val anchor = java.util.regex.Pattern.quote(
      dataDir.toAbsolutePath.toString) + "/([^/]+)/"
    val fsDf = spark.read.parquet(paths: _*)
      .withColumn("__fs", regexp_extract(input_file_name(), anchor, 1))
    val aggs = statsFor.flatMap(c =>
      Seq(min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c")))
    val rows = fsDf.groupBy("__fs").agg(aggs.head, aggs.tail: _*)
      .collect() // ≤ one row per new file-set
    val numeric = fsDf.schema.fields
      .filter(f => statsFor.contains(f.name))
      .map(f => f.name -> f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      .toMap
    def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
    rows.foreach { row =>
      val fs = row.getString(0)
      val lines = statsFor.zipWithIndex.flatMap { case (c, i) =>
        val mn = row.getString(1 + 2 * i); val mx = row.getString(2 + 2 * i)
        if (mn == null || mx == null) None // all-null column: no skipping
        else Some(s"${enc(c)}\t${enc(mn)}\t${enc(mx)}\t${numeric(c)}")
      }
      Files.writeString(dataDir.resolve(fs).resolve("_fstats.tsv"),
        lines.mkString("\n"))
    }
  }

  /** (min, max, isNumeric) per column for a file-set, if stats exist. */
  private def readStatsSidecar(fileSet: String): Map[String, (String, String, Boolean)] = {
    val p = dataDir.resolve(fileSet).resolve("_fstats.tsv")
    if (!Files.exists(p)) return Map.empty
    def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
    Files.readString(p).split("\n").filter(_.nonEmpty).map { line =>
      val Array(c, mn, mx, num) = line.split("\t", 4)
      dec(c) -> ((dec(mn), dec(mx), num.toBoolean))
    }.toMap
  }

  /** Range read with file-set skipping: scans ONLY the file-sets whose
    * recorded [min, max] for `column` overlaps [lower, upper] (file-sets
    * without stats are always read — skipping never loses rows). The
    * residual filter still applies, so results are exact.
    *
    * The bounds are canonicalized through the SAME cast chain the stats
    * were produced with (value → column type → string, evaluated by
    * Spark itself), so pruning and the residual filter agree: a bound
    * like "1996-06-01" compares as "1996-06-01 00:00:00" against
    * timestamp stats instead of lexically mismatching. String ordering
    * uses UTF-8 bytes to match Spark's binary collation. */
  def readRange(column: String, lower: String, upper: String): DataFrame = {
    val fileSets = history.lastOption.map(_.fileSets)
      .getOrElse(sys.error(s"empty table at $root"))
    if (fileSets.isEmpty) return spark.emptyDataFrame // empty-overwrite edge
    val full = readFileSets(fileSets) // lazy: schema only unless needed
    val dt = full.schema(column).dataType
    val kept = overlappingFileSets(fileSets, column, lower, upper, dt)
    val base = if (kept.isEmpty) full.limit(0) else readFileSets(kept)
    base.filter(col(column) >= lit(lower).cast(dt) &&
      col(column) <= lit(upper).cast(dt))
  }

  /** File-sets whose recorded [min, max] for `column` overlaps
    * [lower, upper] under the stats sidecar's comparison rules (numeric
    * columns numerically, everything else UTF-8 binary order after
    * canonicalizing the bounds through the column type). File-sets
    * without stats always qualify — skipping never loses rows. */
  private def overlappingFileSets(fileSets: Seq[String], column: String,
                                  lower: String, upper: String,
                                  dt: org.apache.spark.sql.types.DataType): Seq[String] = {
    val bounds = spark.range(1).select(
      lit(lower).cast(dt).cast("string"), lit(upper).cast(dt).cast("string"))
      .collect().head
    require(!bounds.isNullAt(0) && !bounds.isNullAt(1),
      s"bound not castable to $dt: ($lower, $upper)")
    val (lo, hi) = (bounds.getString(0), bounds.getString(1))
    def utf8Lt(a: String, b: String): Boolean = {
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      var i = 0
      while (i < x.length && i < y.length) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    fileSets.filter { fs =>
      readStatsSidecar(fs).get(column) match {
        case Some((mn, mx, numeric)) =>
          if (numeric)
            !(mx.toDouble < lo.toDouble || mn.toDouble > hi.toDouble)
          else !(utf8Lt(mx, lo) || utf8Lt(hi, mn))
        case None => true
      }
    }
  }

  // ----------------------------------------------------------- public writes

  /** Append-only write: O(new data), never rewrites existing files.
    * `partitionBy` (e.g. snapshot_date — the partitioning the reference
    * documents at docs/architecture.md:56 but never declares) lays the
    * file-set out hive-style so reads get partition pruning; all file-sets
    * of a table must use the same partitioning. On a merge-bucketed table
    * the rows are bucket-split instead so later merges stay copy-on-write.
    * `statsFor` records per-file-set min/max sidecars for [[readRange]]
    * data skipping. */
  def append(df: DataFrame, partitionBy: Seq[String] = Nil,
             statsFor: Seq[String] = Nil): LogEntry =
    bucketSpec match {
      case Some(spec) =>
        require(partitionBy.isEmpty,
          "merge-bucketed tables are laid out by key-hash bucket; partitionBy unsupported")
        val ids = writeBucketedFileSets(df, spec)
        writeStatsSidecars(ids, statsFor)
        commit("append", history.lastOption.map(_.fileSets).getOrElse(Nil) ++ ids)
      case None =>
        val id = writeFileSet(df, partitionBy)
        writeStatsSidecars(Seq(id), statsFor)
        commit("append", history.lastOption.map(_.fileSets).getOrElse(Nil) :+ id)
    }

  /** Full-snapshot replace (the reference's overwrite+overwriteSchema
    * publish). Old versions stay readable — time travel for free. */
  def overwrite(df: DataFrame, partitionBy: Seq[String] = Nil): LogEntry =
    bucketSpec match {
      case Some(spec) =>
        require(partitionBy.isEmpty,
          "merge-bucketed tables are laid out by key-hash bucket; partitionBy unsupported")
        commit("overwrite", writeBucketedFileSets(df, spec))
      case None =>
        commit("overwrite", Seq(writeFileSet(df, partitionBy)))
    }

  /** Delta-style RESTORE: make version `v`'s file-set list the CURRENT
    * snapshot, committed as a NEW version. Metadata-only — no data is
    * read or written (the restored file-sets are immutable and still on
    * disk while `v` is within vacuum retention), and the rollback itself
    * stays in history, exactly Delta's `RESTORE TABLE ... TO VERSION AS
    * OF` semantics (declared: docs/backlog.md:55-58 time-travel family). */
  def restore(v: Long): LogEntry = {
    val e = history.find(_.version == v)
      .getOrElse(sys.error(s"no version $v at $root"))
    // refuse BEFORE committing if vacuum already reclaimed the version's
    // file-sets — committing a HEAD that points at deleted dirs would
    // brick every subsequent read (Delta RESTORE errors the same way)
    val missing = e.fileSets.filterNot(fs => Files.exists(dataDir.resolve(fs)))
    require(missing.isEmpty,
      s"cannot restore to version $v at $root: file-sets vacuumed: " +
        missing.mkString(", "))
    commit("restore", e.fileSets)
  }

  /** DELETE WHERE with data skipping: deletes rows with `column` in
    * [lower, upper] (optionally AND `extraCond`) by rewriting ONLY the
    * file-sets whose min/max stats overlap the range — every other
    * file-set is CARRIED into the new version untouched, which is Delta's
    * file-pruned DELETE. At 100 TB a date-ranged retention delete
    * rewrites the few file-sets of that date range, not the table.
    *
    * File-sets without stats are conservatively rewritten (never lose a
    * delete). Rows where `extraCond` evaluates to NULL are KEPT (SQL
    * DELETE semantics: only predicate-TRUE rows are deleted). Stats
    * sidecars of rewritten file-sets are regenerated for the same
    * columns. Bucketed tables rewrite bucket-split so merges stay COW;
    * hive-partitioned file-sets are rewritten flat (layout, not
    * correctness). */
  def deleteRange(column: String, lower: String, upper: String,
                  extraCond: Option[Column] = None): LogEntry = {
    val fileSets = history.lastOption.map(_.fileSets)
      .getOrElse(sys.error(s"empty table at $root"))
    if (fileSets.isEmpty) return commit("delete", fileSets)
    val dt = readFileSets(fileSets).schema(column).dataType
    val touched = overlappingFileSets(fileSets, column, lower, upper, dt)
    val carried = fileSets.diff(touched)
    if (touched.isEmpty) return commit("delete", fileSets)
    val cond = col(column) >= lit(lower).cast(dt) &&
      col(column) <= lit(upper).cast(dt) &&
      extraCond.getOrElse(lit(true))
    val remaining = readFileSets(touched)
      .filter(!coalesce(cond, lit(false))) // NULL predicate keeps the row
    val statsCols = touched.flatMap(fs => readStatsSidecar(fs).keys)
      .distinct
    val newSets = bucketSpec match {
      case Some(spec) => writeBucketedFileSets(remaining, spec)
      case None       => Seq(writeFileSet(remaining))
    }
    writeStatsSidecars(newSets, statsCols)
    commit("delete", carried ++ newSets)
  }

  /** General DELETE WHERE (no skipping): rewrites the full snapshot minus
    * predicate-TRUE rows. Prefer [[deleteRange]] when the predicate is
    * range-shaped over a stats column. */
  def delete(cond: Column): LogEntry = {
    val remaining = read.filter(!coalesce(cond, lit(false)))
    bucketSpec match {
      case Some(spec) => commit("delete", writeBucketedFileSets(remaining, spec))
      case None       => commit("delete", Seq(writeFileSet(remaining)))
    }
  }

  /** MERGE upsert: update matched target rows with the update row, insert
    * unmatched updates, keep unmatched target rows. Rerun-idempotent
    * (merge twice ≡ merge once) for non-NULL keys, as the reference
    * requires for silver.live_event (docs/backlog.md:49-51,75-78) —
    * EXCEPT with `updateExprs`: a combining expression like
    * `cnt -> (t + u)` intentionally re-applies on every run (that is what
    * incremental aggregation means), so retrying callers must dedupe
    * increments upstream (e.g. via [[readAddedSince]] version bounds).
    * NULL-keyed update rows INSERT on every run (SQL MERGE ON semantics —
    * NULL never matches); replay-safe callers must pre-filter NULL keys,
    * as the streaming conformers do. Additive schema changes on either
    * side are tolerated (Merge.alignForEvolution pads typed NULLs).
    *
    * '''Copy-on-write at bucket granularity''' (the Delta-MERGE
    * touched-files-only plan): the first merge buckets the table on the
    * merge keys (`numBuckets` file-sets); each later merge
    *   1. hashes the update keys to their buckets (one tiny distinct over
    *      ≤ numBuckets ints — bounded, not O(updates)),
    *   2. joins updates against ONLY the touched buckets' file-sets
    *      (both sides shuffle-partition on the keys, AQE broadcasts a
    *      small update side),
    *   3. rewrites just those buckets, carrying every untouched file-set
    *      into the new log entry unchanged.
    * A merge into a pre-existing unbucketed table migrates it (one full
    * rewrite, then copy-on-write forever after). Updates are deduplicated
    * per key first (latest by `preferUpdateBy` wins) so the join is 1:1.
    */
  def merge(updates: DataFrame, keys: Seq[String],
            preferUpdateBy: Option[String] = None,
            numBuckets: Int = DefaultMergeBuckets,
            updateExprs: Map[String, (Column, Column) => Column] = Map.empty): LogEntry = {
    require(keys.nonEmpty, "merge requires at least one key column")
    // Key columns are cast to the TABLE's types up front: hash() is
    // type-sensitive (hash(42: int) != hash(42L: bigint) — same reason
    // readForKeys casts its literals), so an update feed whose key type
    // drifted (int vs bigint producer) would hash to the WRONG buckets —
    // the stale target row would survive in a carried file-set and the
    // update would land as a duplicate insert in another bucket.
    val typedUpdates = if (!exists) updates else {
      val tblSchema = read.schema
      keys.foldLeft(updates) { (d, k) =>
        (tblSchema.find(_.name == k), d.schema.find(_.name == k)) match {
          case (Some(t), Some(u)) if t.dataType != u.dataType =>
            d.withColumn(k, col(k).cast(t.dataType))
          case _ => d
        }
      }
    }
    // the deduped lineage (a window / dropDuplicates) feeds the touched-
    // bucket probe, the upsert join AND the bucketed write — persist so
    // it is computed once per merge, not three times
    val dedupedUpdates = (preferUpdateBy match {
      case Some(ord) => graft.ops.Keyed.latestPerKey(typedUpdates, keys, ord)
      case None      => typedUpdates.dropDuplicates(keys)
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def upsertInto(target: DataFrame): DataFrame = {
      val (t2, u2) = graft.ops.Merge.alignForEvolution(target, dedupedUpdates)
      graft.ops.Merge.upsert(t2, u2, keys, updateExprs)
    }
    try bucketSpec match {
      case Some(spec) =>
        require(spec.keys == keys,
          s"merge keys $keys != table bucket keys ${spec.keys} at $root")
        val prev = history.lastOption.map(_.fileSets).getOrElse(Nil)
        if (prev.forall(bucketOf(_).isDefined)) {
          val touched = dedupedUpdates
            .select(bucketExpr(spec).as(BucketCol)).distinct()
            .collect().map(_.getInt(0)).toSet // ≤ numBuckets values
          val (touchedSets, untouched) =
            prev.partition(fs => bucketOf(fs).exists(touched.contains))
          val merged =
            if (touchedSets.isEmpty) dedupedUpdates
            else upsertInto(readFileSets(touchedSets))
          commit("merge", untouched ++ writeBucketedFileSets(merged, spec))
        } else { // unbucketed file-sets present (e.g. pre-spec appends): migrate
          commit("merge", writeBucketedFileSets(upsertInto(read), spec))
        }
      case None if !exists =>
        writeSpec(BucketSpec(keys, numBuckets))
        commit("merge", writeBucketedFileSets(dedupedUpdates, bucketSpec.get))
      case None => // one-time migration of a legacy unbucketed table
        val spec = BucketSpec(keys, numBuckets)
        val merged = upsertInto(read)
        writeSpec(spec)
        commit("merge", writeBucketedFileSets(merged, spec))
    } finally dedupedUpdates.unpersist()
  }

  /** Point-lookup read on a merge-bucketed table: scans ONLY the file-sets
    * of the buckets the given key tuples hash to — the read-side payoff of
    * the bucketed layout (a key lookup touches 1/numBuckets of the table's
    * files; at 100 TB with 4096 buckets, ~25 GB instead of 100 TB). Falls
    * back to a full-snapshot read + filter on unbucketed tables. The
    * returned frame is already filtered to the requested keys.
    *
    * `keyValues`: one Seq per key tuple, values in `bucketSpec.keys` order. */
  def readForKeys(keyValues: Seq[Seq[Any]]): DataFrame = {
    require(keyValues.nonEmpty, "readForKeys requires at least one key tuple")
    val spec = bucketSpec
    val keyFilter = (df: DataFrame) => {
      val keys = spec.map(_.keys).getOrElse(
        sys.error(s"readForKeys needs a bucketed table at $root"))
      val cond = keyValues.map(tuple =>
        keys.zip(tuple).map { case (k, v) => col(k) <=> lit(v) }
          .reduce(_ && _)).reduce(_ || _)
      df.filter(cond)
    }
    spec match {
      case None => keyFilter(read)
      case Some(sp) =>
        // bucket each key tuple driver-side with Spark's own hash expr so
        // the routing matches the write path exactly (one tiny local job).
        // Literals are CAST to the table's column types first: hash() is
        // type-sensitive (hash(42: int) != hash(42L: bigint)), so an
        // uncast literal would silently probe the wrong bucket.
        val schema = read.schema
        val lits = keyValues.map { tuple =>
          val typed = sp.keys.zip(tuple).map { case (k, v) =>
            schema.find(_.name == k)
              .map(f => lit(v).cast(f.dataType)).getOrElse(lit(v))
          }
          pmod(hash(typed: _*), lit(sp.numBuckets))
        }
        val buckets = spark.range(1)
          .select(array(lits: _*).as("b")).head().getSeq[Int](0).toSet
        val prev = history.lastOption.map(_.fileSets).getOrElse(Nil)
        val (tagged, untagged) = prev.partition(bucketOf(_).isDefined)
        val hit = tagged.filter(fs => bucketOf(fs).exists(buckets.contains)) ++
          untagged // pre-spec file-sets can hold any key
        if (hit.isEmpty) keyFilter(read.limit(0))
        else keyFilter(readFileSets(hit))
    }
  }

  /** OPTIMIZE-style small-file compaction: rewrite the current snapshot
    * into `numFiles` files as a new version. Bucketed tables compact to
    * one file-set per bucket (preserving copy-on-write merge). */
  def compact(numFiles: Int = 1): LogEntry = bucketSpec match {
    case Some(spec) => commit("compact", writeBucketedFileSets(read, spec))
    case None       => commit("compact", Seq(writeFileSet(read.coalesce(numFiles))))
  }

  /** VACUUM: delete file-sets unreachable from the last `retainVersions`
    * versions (older versions stop being time-travelable, as with Delta
    * VACUUM). */
  def vacuum(retainVersions: Int = 1): Unit = {
    val h = history
    val keep = h.takeRight(retainVersions).flatMap(_.fileSets).toSet
    listDir(dataDir)
      .filterNot(p => keep.contains(p.getFileName.toString))
      .foreach(deleteRecursively)
    // orphaned staging from crashed writers (never referenced by the log)
    listDir(stagingDir).foreach(deleteRecursively)
  }

  private def deleteRecursively(p: Path): Unit = {
    listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}

object VersionedTable {
  def apply(spark: SparkSession, root: String): VersionedTable =
    new VersionedTable(spark, root)

  /** Bucket column name used transiently during bucketed writes (lives only
    * in staging dir names, never in the parquet schema). */
  private val BucketCol = "_gbucket"
  private val BucketedName = """.*\.b(\d+)$""".r
  private val SchemaTagged = """.*\.s([0-9a-f]{8})(?:\.b\d+)?$""".r

  /** Default bucket count for merge tables. Sized for the test scales here;
    * at 100 TB pass numBuckets ≈ table_bytes / target_rewrite_bytes (e.g.
    * 4096 for ~25 GB per bucket) on the first merge. */
  val DefaultMergeBuckets = 16

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

  /** Key-hash bucketing spec for copy-on-write merge tables. */
  final case class BucketSpec(keys: Seq[String], numBuckets: Int) {
    require(numBuckets > 0, "numBuckets must be positive")
    def toJson: String =
      s"""{"keys":${keys.map(k => "\"" + k + "\"").mkString("[", ",", "]")},"numBuckets":$numBuckets}"""
  }
  object BucketSpec {
    private val Pattern =
      """\{"keys":\[([^\]]*)\],"numBuckets":(\d+)\}""".r
    def parse(s: String): BucketSpec = s.trim match {
      case Pattern(ks, n) =>
        val keys =
          if (ks.isEmpty) Nil
          else ks.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
        BucketSpec(keys, n.toInt)
      case other => sys.error(s"bad bucket spec: $other")
    }
  }
}
