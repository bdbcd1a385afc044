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
    * HISTORY SQL surface, docs/backlog.md:55-58). */
  def registerViews(): Seq[String] =
    tables.flatMap { case (l, t) =>
      val name = s"${l}_$t"
      val tbl = table(l, t)
      tbl.read.createOrReplaceTempView(name)
      tbl.historyDf.createOrReplaceTempView(s"${name}_history")
      Seq(name, s"${name}_history")
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
