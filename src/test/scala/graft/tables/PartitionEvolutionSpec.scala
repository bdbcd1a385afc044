package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Iceberg-style partition evolution: metadata-only layout re-declaration;
  * old arms keep their dirs, new writes use the new layout, OPTIMIZE
  * migrates incrementally. */
class PartitionEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, String, String)*) =
    rows.toDF("id", "month", "region")

  private def dataDirs(root: String): Seq[String] = {
    val d = Paths.get(root, "data")
    if (!Files.isDirectory(d)) return Nil
    val s = Files.list(d)
    try s.iterator().asScala.toList.map(_.getFileName.toString).sorted
    finally s.close()
  }

  private def hiveKeysOf(root: String, fileSet: String): Seq[String] = {
    val s = Files.list(Paths.get(root, "data", fileSet))
    try s.iterator().asScala.toList
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.contains("="))
      .map(_.getFileName.toString.split("=")(0)).distinct.sorted
    finally s.close()
  }

  test("evolve month->region: old arms keep dirs, new writes use new " +
       "layout, reads union exactly, time travel unaffected") {
    val root = tmpDir("pevo-")
    val t = VersionedTable(spark, root)
    t.append(df((1, "2024-01", "eu"), (2, "2024-02", "us")),
      partitionBy = Seq("month"))                                   // v0
    val e = t.evolvePartitionLayout(Seq("region"))                  // v1
    assert(e.action === "set_partition_layout")
    assert(t.partitionLayout === Seq("region"))
    // the evolution commit carries the snapshot verbatim
    assert(t.read.count() === 2)
    // a new append lays out by region; the old file-set still has month dirs
    t.append(df((3, "2024-03", "eu")), partitionBy = Seq("region")) // v2
    val perSet = dataDirs(root).map(fs => hiveKeysOf(root, fs))
    assert(perSet.contains(Seq("month")) && perSet.contains(Seq("region")))
    // the union reads every row with full logical schema
    assert(t.read.select("id", "month", "region").as[(Int, String, String)]
      .collect().toSet ===
      Set((1, "2024-01", "eu"), (2, "2024-02", "us"), (3, "2024-03", "eu")))
    // appends declaring the RETIRED layout are refused
    assertThrows[IllegalArgumentException](
      t.append(df((4, "2024-04", "ap")), partitionBy = Seq("month")))
    // time travel: the pre-evolution snapshot is untouched
    assert(t.readVersion(0).count() === 2)
  }

  test("OPTIMIZE migrates every file-set to the evolved layout") {
    val root = tmpDir("pevo-opt-")
    val t = VersionedTable(spark, root)
    t.append(df((1, "2024-01", "eu"), (2, "2024-02", "us")),
      partitionBy = Seq("month"))
    t.evolvePartitionLayout(Seq("region"))
    t.append(df((3, "2024-03", "eu")), partitionBy = Seq("region"))
    val before = t.read.select("id", "month", "region")
      .as[(Int, String, String)].collect().toSet
    t.compact()
    // every file-set the compacted snapshot references is region-laid-out
    val liveSets = t.history.last.fileSets
    assert(liveSets.nonEmpty &&
      liveSets.forall(fs => hiveKeysOf(root, fs) === Seq("region")))
    assert(t.read.select("id", "month", "region")
      .as[(Int, String, String)].collect().toSet === before)
  }

  test("refusals: bucketed tables, unknown columns, no-op layout; " +
       "evolve-to-flat allowed") {
    val root = tmpDir("pevo-ref-")
    val t = VersionedTable(spark, root)
    t.append(df((1, "2024-01", "eu")), partitionBy = Seq("month"))
    assertThrows[IllegalArgumentException](
      t.evolvePartitionLayout(Seq("nope")))
    assertThrows[IllegalArgumentException](
      t.evolvePartitionLayout(Seq("month")))
    t.evolvePartitionLayout(Nil) // to flat
    assert(t.partitionLayout.isEmpty)
    t.append(df((2, "2024-02", "us"))) // flat append now fine
    assert(t.read.count() === 2)

    val broot = tmpDir("pevo-b-")
    val b = VersionedTable(spark, broot)
    b.merge(df((1, "2024-01", "eu")), Seq("id"), numBuckets = 2)
    assertThrows[IllegalArgumentException](
      b.evolvePartitionLayout(Seq("region")))
  }

  test("evolution is transparent to incremental consumers: " +
       "readAddedSince and the change feed skip the layout commit") {
    val root = tmpDir("pevo-incr-")
    val t = VersionedTable(spark, root)
    t.enableChangeFeed()
    t.append(df((1, "2024-01", "eu")), partitionBy = Seq("month"))  // v0
    t.evolvePartitionLayout(Seq("region"))                          // v1
    t.append(df((2, "2024-02", "us")), partitionBy = Seq("region")) // v2
    // the incremental read crosses the evolution commit: exactly v2's rows
    assert(t.readAddedSince(0).select("id").as[Int].collect().toSeq === Seq(2))
    // the change feed reports both appends as inserts and NOTHING for
    // the metadata-only layout commit
    val feed = t.readChangeFeed(-1)
    assert(feed.where("_change_type = 'insert'").count() === 2)
    assert(feed.where("_commit_version = 1").count() === 0)
  }

  test("a registered MV stays armed across the evolution commit " +
       "(file-set path set unchanged); a data commit still un-arms") {
    graft.plans.MvRewrite.install(spark)
    val root = tmpDir("pevo-mv-")
    val t = VersionedTable(spark, s"$root/src")
    val mv = VersionedTable(spark, s"$root/mv")
    t.append(df((1, "2024-01", "eu"), (2, "2024-01", "us")),
      partitionBy = Seq("month"))
    mv.overwrite(t.read.groupBy("region").agg(count(lit(1)).as("n")))
    graft.plans.MvRewrite.register(t, mv, Seq("region"),
      Seq(graft.plans.MvRewrite.AggSpec("count", "*", "n")))
    try {
      def servedFromMv(): Boolean = {
        val q = t.read.groupBy("region").agg(count(lit(1)).as("n"))
        val paths = graft.plans.MvRewrite.scannedPaths(q)
        paths.nonEmpty && paths.forall(_.contains("/mv"))
      }
      assert(servedFromMv(), "MV should serve before the DDL")
      t.evolvePartitionLayout(Seq("region")) // metadata-only, data unchanged
      assert(servedFromMv(), "metadata-only evolution must not un-arm the MV")
      t.append(df((3, "2024-02", "eu")), partitionBy = Seq("region"))
      assert(!servedFromMv(), "a data commit still un-arms")
    } finally graft.plans.MvRewrite.deregisterRoot(s"$root/mv")
  }

  test("SQL: ALTER TABLE ... SET PARTITIONED BY evolves; () flattens") {
    val root = tmpDir("pevo-sql-")
    val gsql = GraftSql(spark)
    val t = VersionedTable(spark, root)
    t.append(df((1, "2024-01", "eu")), partitionBy = Seq("month"))
    gsql.sql(s"ALTER TABLE graft.`$root` SET PARTITIONED BY (region)")
    assert(t.partitionLayout === Seq("region"))
    gsql.sql(s"ALTER TABLE graft.`$root` SET PARTITIONED BY ()")
    assert(t.partitionLayout.isEmpty)
    // history carries both DDL rows
    assert(t.history.count(_.action == "set_partition_layout") === 2)
  }

  test("interplay: REPLACE WHERE and SHOW PARTITIONS work across " +
       "mixed-layout arms") {
    val root = tmpDir("pevo-rw-")
    val gsql = GraftSql(spark)
    val t = VersionedTable(spark, root)
    t.append(df((1, "2024-01", "eu"), (2, "2024-01", "us")),
      partitionBy = Seq("month"))
    t.evolvePartitionLayout(Seq("region"))
    t.append(df((3, "2024-02", "eu")), partitionBy = Seq("region"))
    // REPLACE WHERE on the NEW partition key: the predicate condition
    // applies by VALUE, so rows in the old-layout arm replace too
    t.replaceWhere(col("region") === "eu",
      df((10, "2024-03", "eu"), (11, "2024-03", "eu")))
    assert(t.read.select("id", "region").as[(Int, String)]
      .collect().toSet === Set((2, "us"), (10, "eu"), (11, "eu")))
    // SHOW PARTITIONS is value-based: current distinct values of the
    // CURRENT layout key, regardless of which arm holds them
    val parts = gsql.sql(s"SHOW PARTITIONS graft.`$root`")
      .as[String].collect().toSeq.sorted
    assert(parts === Seq("eu", "us"))
  }

  test("plan: a filter on the NEW key prunes optimally per arm - dir " +
       "pruning on the new-layout arm, parquet pushdown on the old") {
    val root = tmpDir("pevo-plan-")
    val t = VersionedTable(spark, root)
    t.append(df((1, "2024-01", "eu"), (2, "2024-02", "us")),
      partitionBy = Seq("month"))
    t.evolvePartitionLayout(Seq("region"))
    t.append(df((3, "2024-03", "eu"), (4, "2024-03", "us")),
      partitionBy = Seq("region"))
    val plan = t.read.filter(col("region") === "eu").select("id")
      .queryExecution.executedPlan.toString
    // new arm: region is a hive dir -> PartitionFilters (zero data read
    // for non-matching dirs); old arm: region is a data column -> the
    // predicate reaches the parquet reader as a pushed filter
    assert(plan.contains("PartitionFilters: [isnotnull(region") &&
      plan.contains("(region") && plan.contains("= eu)"),
      s"no partition pruning on the new arm:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(region), EqualTo(region,eu)]"),
      s"filter not pushed into the old arm's scan:\n$plan")
    assert(t.read.filter(col("region") === "eu").select("id")
      .as[Int].collect().toSeq.sorted === Seq(1, 3))
  }
}
