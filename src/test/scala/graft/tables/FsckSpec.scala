package graft.tables

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** FSCK REPAIR TABLE: forward-fix a snapshot whose files were deleted
  * out-of-band (Delta parity). */
class FsckSpec extends SparkSpec {
  import spark.implicits._

  private def rmTree(p: java.nio.file.Path): Unit =
    VersionedTable.deleteRecursively(p)

  test("DRY RUN lists lost file-sets without committing; REPAIR drops " +
       "them; clean table is a no-op") {
    val root = tmpDir("fsck-")
    val t = VersionedTable(spark, root)
    t.append(Seq(1, 2).toDF("x")) // v0
    t.append(Seq(3, 4).toDF("x")) // v1
    // clean: nothing missing, no commit
    assert(t.fsckRepair() === ((Nil, None)))
    assert(t.history.map(_.action) === Seq("append", "append"))

    // lose v0's file-set out-of-band
    val lost = t.history.head.fileSets.head
    rmTree(Paths.get(root, "data", lost))
    // the head read now fails on the missing files
    assertThrows[Exception](t.read.count())

    val (preview, none) = t.fsckRepair(dryRun = true)
    assert(preview === Seq(lost) && none.isEmpty)
    assert(t.history.size === 2) // dry run never commits

    val (missing, entry) = t.fsckRepair()
    assert(missing === Seq(lost))
    assert(entry.exists(_.action === "fsck"))
    assert(t.read.as[Int].collect().toSet === Set(3, 4))
    // idempotent: a second repair finds nothing
    assert(t.fsckRepair() === ((Nil, None)))
  }

  test("SQL: FSCK REPAIR TABLE funnel route with and without DRY RUN") {
    val root = tmpDir("fsck-sql-")
    val gsql = GraftSql(spark)
    val t = VersionedTable(spark, root)
    t.append(Seq(1).toDF("x"))
    t.append(Seq(2).toDF("x"))
    val lost = t.history.head.fileSets.head
    rmTree(Paths.get(root, "data", lost))
    val dry = gsql.sql(s"FSCK REPAIR TABLE graft.`$root` DRY RUN")
      .as[(String, Boolean)].collect().toSeq
    assert(dry === Seq((lost, false)))
    val fixed = gsql.sql(s"FSCK REPAIR TABLE graft.`$root`")
      .as[(String, Boolean)].collect().toSeq
    assert(fixed === Seq((lost, true)))
    assert(t.read.as[Int].collect().toSet === Set(2))
  }

  test("repair interacts cleanly with partition evolution: an evolved " +
       "table loses one old-layout arm and repairs forward") {
    val root = tmpDir("fsck-evo-")
    val t = VersionedTable(spark, root)
    t.append(Seq((1, "2024-01", "eu"), (2, "2024-02", "us"))
      .toDF("id", "month", "region"), partitionBy = Seq("month"))
    t.evolvePartitionLayout(Seq("region"))
    t.append(Seq((3, "2024-03", "eu")).toDF("id", "month", "region"),
      partitionBy = Seq("region"))
    val lost = t.history.head.fileSets.head // the month-layout arm
    rmTree(Paths.get(root, "data", lost))
    val (missing, entry) = t.fsckRepair()
    assert(missing === Seq(lost) && entry.exists(_.action === "fsck"))
    // only the new-layout arm survives; layout record untouched
    assert(t.read.select("id").as[Int].collect().toSeq === Seq(3))
    assert(t.partitionLayout === Seq("region"))
  }

  test("partial file loss is detected via the manifest and REFUSES " +
       "repair; a missing deletion vector refuses too") {
    import scala.jdk.CollectionConverters._
    val root = tmpDir("fsck-deep-")
    val t = VersionedTable(spark, root)
    t.append(spark.range(0, 100).selectExpr("id").repartition(4))
    // lose ONE parquet file inside the (only) file-set
    val fsDir = Paths.get(root, "data", t.history.head.fileSets.head)
    val one = Files.list(fsDir).iterator().asScala.toList
      .filter(_.getFileName.toString.endsWith(".parquet")).head
    Files.delete(one)
    val (preview, none) = t.fsckRepair(dryRun = true)
    assert(preview.exists(_.endsWith("(partial)")) && none.isEmpty)
    val e = intercept[IllegalArgumentException](t.fsckRepair())
    assert(e.getMessage.contains("lost individual data files"))

    // a lost deletion vector must never be "repaired" away: that would
    // resurrect the deleted rows
    val droot = tmpDir("fsck-dv-")
    val d = VersionedTable(spark, droot)
    d.append(Seq(1, 2, 3, 4).toDF("x"))
    d.deleteVectors(org.apache.spark.sql.functions.col("x") === 2)
    val dv = d.history.last.dvs.head
    // HOLLOWED vector first: the dir (and its manifest) survive but the
    // parquet part is gone — must be flagged exactly like a vanished dir
    val dvDir = Paths.get(droot, "_dv", dv)
    val part = Files.list(dvDir).iterator().asScala.toList
      .filter(_.getFileName.toString.endsWith(".parquet")).head
    Files.delete(part)
    val (pvHollow, _) = d.fsckRepair(dryRun = true)
    assert(pvHollow.exists(_.contains("(deletion vector)")),
      "hollowed DV dir must be reported")
    rmTree(dvDir) // now fully gone
    val (pv, _) = d.fsckRepair(dryRun = true)
    assert(pv.exists(_.contains("(deletion vector)")))
    val e2 = intercept[IllegalArgumentException](d.fsckRepair())
    assert(e2.getMessage.contains("resurrect"))
  }
}
