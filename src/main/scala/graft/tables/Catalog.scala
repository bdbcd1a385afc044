package graft.tables

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Catalog bootstrap (S6): the engine's stand-in for the reference's
  * idempotent UC DDL (notebooks/00_admin/00_create_uc_objects.py:31-361,
  * resources/uc/objects.sql). A warehouse is a directory tree
  * `<root>/<layer>/<table>` of [[VersionedTable]]s; `bootstrap` creates
  * layers idempotently (CREATE SCHEMA IF NOT EXISTS) and `registerViews`
  * exposes every existing table as a `<layer>_<table>` temp view so
  * `spark.sql` can query the warehouse (the `layer.table` namespace
  * flattened — Spark temp views are single-level). */
final class Catalog(spark: SparkSession, root: String) {

  val Layers: Seq[String] = Seq("bronze", "silver", "gold")

  /** Idempotent: create the layer directories. */
  def bootstrap(): Unit =
    Layers.foreach(l => Files.createDirectories(Paths.get(root, l)))

  def table(layer: String, name: String): VersionedTable = {
    require(Layers.contains(layer), s"unknown layer $layer")
    VersionedTable(spark, s"$root/$layer/$name")
  }

  private def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    if (!Files.isDirectory(p)) return Seq.empty
    val s = Files.list(p)
    try s.iterator().asScala.toList finally s.close()
  }

  /** All (layer, table) pairs with at least one committed version. */
  def tables: Seq[(String, String)] =
    for {
      l <- Layers
      t <- listDir(Paths.get(root, l))
        .filter(Files.isDirectory(_)).map(_.getFileName.toString).sorted
      if table(l, t).exists
    } yield (l, t)

  /** CREATE OR REPLACE VIEW for every table: `<layer>_<table>`, plus a
    * `<layer>_<table>_history` view over its version log (the DESCRIBE
    * HISTORY SQL surface, docs/backlog.md:55-58) — then every DURABLE
    * view from the warehouse ledger, in creation order (a later view
    * may reference an earlier one or any table view). */
  def registerViews(): Seq[String] =
    tables.flatMap { case (l, t) =>
      val name = s"${l}_$t"
      val tbl = table(l, t)
      tbl.read.createOrReplaceTempView(name)
      tbl.historyDf.createOrReplaceTempView(s"${name}_history")
      Seq(name, s"${name}_history")
    } ++ registerDurableViews()

  /** Register the durable views, order-insensitively: CREATE TEMP VIEW
    * analyzes its query eagerly, so a definition referencing a view
    * that appears LATER in the ledger (legal — OR REPLACE keeps the
    * original position) would fail a single in-order pass. Fixed-point
    * retry: each pass registers what resolves, and only a view that
    * NEVER resolves (genuinely broken — its reference is gone) throws,
    * after everything registrable has registered. */
  private def registerDurableViews(): Seq[String] = {
    var pending = views
    val done = scala.collection.mutable.ArrayBuffer.empty[String]
    var progressed = true
    while (pending.nonEmpty && progressed) {
      progressed = false
      pending = pending.filter { case (name, sql) =>
        try {
          spark.sql(s"CREATE OR REPLACE TEMP VIEW $name AS $sql")
          done += name
          progressed = true
          false
        } catch { case scala.util.control.NonFatal(_) => true }
      }
    }
    pending.headOption.foreach { case (name, sql) =>
      // surface the real analysis error for the first unresolvable view
      spark.sql(s"CREATE OR REPLACE TEMP VIEW $name AS $sql")
    }
    done.toSeq
  }

  // ------------------------------------------------------- durable views

  private def viewsPath = Paths.get(root, "_views.ledger")

  /** Durable view definitions, creation-ordered — the stand-in for the
    * reference's persistent UC views (vw_player_fixture_horizon,
    * 00_create_uc_objects.py:312-324): a session temp view dies with
    * the session; these re-register on every catalog open. The ledger
    * stores `name TAB base64(sql)` per line — SQL text is arbitrary
    * (quotes, newlines, unicode), and base64 round-trips it without a
    * hand-rolled escaper to get subtly wrong. */
  def views: Seq[(String, String)] =
    if (!Files.exists(viewsPath)) Nil
    else Files.readString(viewsPath).split("\n").toSeq
      .filter(_.nonEmpty).map { line =>
        val Array(name, b64) = line.split("\t", 2)
        name -> new String(java.util.Base64.getDecoder.decode(b64),
          java.nio.charset.StandardCharsets.UTF_8)
      }

  /** CREATE OR REPLACE VIEW: persist the definition and register it for
    * this session (registration analyzes the query eagerly, so the
    * views/tables THIS definition references must already be
    * registered; cross-session replay order is handled by
    * [[registerDurableViews]]'s fixed-point pass). A replaced name
    * keeps its original ledger position. */
  def createView(name: String, sqlText: String): Unit = {
    require(name.matches("""[A-Za-z_][A-Za-z0-9_]*"""),
      s"CREATE VIEW: bad view name `$name`")
    val cur = views
    val next =
      if (cur.exists(_._1 == name))
        cur.map { case (n, s) => (n, if (n == name) sqlText else s) }
      else cur :+ (name -> sqlText)
    writeViews(next)
    spark.sql(s"CREATE OR REPLACE TEMP VIEW $name AS $sqlText")
    ()
  }

  /** DROP VIEW: remove from the ledger and the session. */
  def dropView(name: String): Unit = {
    writeViews(views.filterNot(_._1 == name))
    spark.catalog.dropTempView(name)
    ()
  }

  private def writeViews(entries: Seq[(String, String)]): Unit = {
    val lines = entries.map { case (n, s) =>
      s"$n\t${java.util.Base64.getEncoder.encodeToString(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8))}"
    }
    val tmp = viewsPath.resolveSibling(
      s".views-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, lines.mkString("\n") + (if (lines.isEmpty) "" else "\n"))
    Files.move(tmp, viewsPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** DROP TABLE semantics (01_environment_smoke_test.py:93): remove the
    * table directory and its temp view if registered. */
  def dropTable(layer: String, name: String): Unit = {
    // an armed materialized view keyed by this root must un-arm BEFORE
    // its files go away, or the routing rule would serve matching
    // queries from a dead path — the same guard the SQL DROP funnel
    // applies; direct library callers get it here
    graft.plans.MvRewrite.deregisterRoot(s"$root/$layer/$name")
    spark.catalog.dropTempView(s"${layer}_$name")
    def rm(p: java.nio.file.Path): Unit = {
      listDir(p).foreach(rm)
      Files.deleteIfExists(p)
    }
    rm(Paths.get(root, layer, name))
  }
}
