package graft.plans

import graft.SparkSpec
import graft.tables.{Catalog, GraftSql, VersionedTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** [[GeneratedPrune]]: predicates on a generated partition column's
  * SOURCE column derive partition filters — Delta's generated-column
  * partition pruning, the 100 TB "filter on the timestamp, prune by
  * the day directory" shape. */
class GeneratedPruneSpec extends SparkSpec {
  import spark.implicits._

  private def warehouse(): (Catalog, GraftSql) = {
    val cat = new Catalog(spark, tmpDir("graft-gp-"))
    cat.bootstrap()
    (cat, GraftSql(spark, cat))
  }

  // a graft table read unions a zero-row schema-pin arm with the
  // hive-partitioned data arms — count partitions over the PARTITIONED
  // scans only, descending into AQE plans
  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    val plan = df.queryExecution.executedPlan
    val direct = plan.collect { case f: FileSourceScanExec => f }
    val adaptive = plan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
    }.flatMap(_.collect { case f: FileSourceScanExec => f })
    direct ++ adaptive
  }
  private def partsScanned(df: DataFrame): Long =
    scans(df).filter(_.relation.partitionSchema.nonEmpty)
      .map(_.selectedPartitions.partitionCount.toLong).sum
  private def partFilters(df: DataFrame): String =
    scans(df).map(f => f.metadata.getOrElse("PartitionFilters", ""))
      .mkString(";")

  test("range predicate on the SOURCE column prunes partitions through " +
       "substring-prefix generation; results unchanged") {
    MvRewrite.install(spark)
    val (cat, sql) = warehouse()
    sql.sql("CREATE TABLE silver.ev (ts STRING, v INT, " +
      "day STRING GENERATED ALWAYS AS (substring(ts, 1, 10))) " +
      "PARTITIONED BY (day)")
    sql.sql("INSERT INTO silver.ev (ts, v) VALUES " +
      "('2026-01-01T10:00', 1), ('2026-01-01T11:00', 2), " +
      "('2026-01-02T09:00', 3), ('2026-01-03T09:00', 4)")
    val t = cat.table("silver", "ev")
    assert(partsScanned(t.read) === 3)
    // the query never mentions `day` — the rule derives day >= / day =
    val ranged = t.read.filter(col("ts") >= "2026-01-02").select("v")
    assert(partFilters(ranged).contains("day"),
      s"no derived partition filter: ${partFilters(ranged)}")
    assert(partsScanned(ranged) === 2)
    assert(ranged.as[Int].collect().sorted.toSeq === Seq(3, 4))
    val eq = t.read.filter(col("ts") === "2026-01-02T09:00").select("v")
    assert(partsScanned(eq) === 1)
    assert(eq.as[Int].collect().toSeq === Seq(3))
    // IN derives too
    val in = t.read.filter(col("ts")
      .isin("2026-01-01T10:00", "2026-01-03T09:00")).select("v")
    assert(partsScanned(in) === 2)
    assert(in.as[Int].collect().sorted.toSeq === Seq(1, 4))
    // an upper bound prunes from the other side
    val upper = t.read.filter(col("ts") < "2026-01-02").select("v")
    assert(partsScanned(upper) === 2,
      "day <= '2026-01-02' keeps days 1 and 2 (strict-> non-strict is " +
        "the sound derivation)")
    assert(upper.as[Int].collect().sorted.toSeq === Seq(1, 2))
  }

  test("CAST(ts AS DATE) generation prunes on timestamp predicates " +
       "with the partition column's inferred type") {
    MvRewrite.install(spark)
    val (cat, sql) = warehouse()
    sql.sql("CREATE TABLE silver.tsv (ts TIMESTAMP, v INT, " +
      "d DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) PARTITIONED BY (d)")
    sql.sql("INSERT INTO silver.tsv (ts, v) VALUES " +
      "(TIMESTAMP'2026-02-01 10:00:00', 1), " +
      "(TIMESTAMP'2026-02-02 10:00:00', 2), " +
      "(TIMESTAMP'2026-02-03 10:00:00', 3)")
    val t = cat.table("silver", "tsv")
    val q = t.read
      .filter(col("ts") >= lit("2026-02-02 00:00:00").cast("timestamp"))
      .select("v")
    assert(partsScanned(q) === 2)
    assert(q.as[Int].collect().sorted.toSeq === Seq(2, 3))
  }

  test("non-monotone generation derives equality but never ranges; " +
       "OR-embedded predicates derive nothing") {
    MvRewrite.install(spark)
    val (cat, sql) = warehouse()
    // reversed prefix: deterministic, NOT order-preserving
    sql.sql("CREATE TABLE silver.rv (ts STRING, v INT, " +
      "rday STRING GENERATED ALWAYS AS (reverse(substring(ts, 1, 10)))) " +
      "PARTITIONED BY (rday)")
    sql.sql("INSERT INTO silver.rv (ts, v) VALUES " +
      "('2026-01-01T10:00', 1), ('2026-01-02T09:00', 2), " +
      "('2026-01-03T09:00', 3)")
    val t = cat.table("silver", "rv")
    val eq = t.read.filter(col("ts") === "2026-01-02T09:00").select("v")
    assert(partsScanned(eq) === 1)
    assert(eq.as[Int].collect().toSeq === Seq(2))
    // a range on a non-monotone generator must NOT derive
    val ranged = t.read.filter(col("ts") >= "2026-01-02").select("v")
    assert(partsScanned(ranged) === 3,
      "range derivation through a non-monotone expression is unsound")
    assert(ranged.as[Int].collect().sorted.toSeq === Seq(2, 3))
    // OR-embedded source predicates imply nothing conjunct-wise
    val ored = t.read.filter(col("ts") === "2026-01-02T09:00" ||
      col("v") === 1).select("v")
    assert(partsScanned(ored) === 3)
    assert(ored.as[Int].collect().sorted.toSeq === Seq(1, 2))
  }

  test("to_date over a STRING source derives equality but never ranges " +
       "(lenient parsing breaks lexicographic-order monotonicity)") {
    MvRewrite.install(spark)
    val (cat, sql) = warehouse()
    sql.sql("CREATE TABLE silver.td (ts STRING, v INT, " +
      "d DATE GENERATED ALWAYS AS (to_date(ts))) PARTITIONED BY (d)")
    // '2026-1-5' is lexicographically >= '2026-01-31' yet lives in the
    // 2026-01-05 partition — a string-order-derived range would prune
    // its partition and silently drop the row
    sql.sql("INSERT INTO silver.td (ts, v) VALUES " +
      "('2026-01-31', 1), ('2026-1-5', 2), ('2026-02-10', 3)")
    val t = cat.table("silver", "td")
    val ranged = t.read.filter(col("ts") >= "2026-01-31").select("v")
    assert(partsScanned(ranged) === 3,
      "range derivation through to_date(STRING) is unsound")
    assert(ranged.as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
    // equality still derives (any deterministic f)
    val eq = t.read.filter(col("ts") === "2026-02-10").select("v")
    assert(partsScanned(eq) === 1)
    assert(eq.as[Int].collect().toSeq === Seq(3))
  }

  test("to_date over a TIMESTAMP source still derives ranges " +
       "(calendar truncation is monotone)") {
    MvRewrite.install(spark)
    val (cat, sql) = warehouse()
    sql.sql("CREATE TABLE silver.tdt (ts TIMESTAMP, v INT, " +
      "d DATE GENERATED ALWAYS AS (to_date(ts))) PARTITIONED BY (d)")
    sql.sql("INSERT INTO silver.tdt (ts, v) VALUES " +
      "(TIMESTAMP'2026-03-01 10:00:00', 1), " +
      "(TIMESTAMP'2026-03-02 10:00:00', 2), " +
      "(TIMESTAMP'2026-03-03 10:00:00', 3)")
    val t = cat.table("silver", "tdt")
    val q = t.read
      .filter(col("ts") >= lit("2026-03-02 00:00:00").cast("timestamp"))
      .select("v")
    assert(partsScanned(q) === 2)
    assert(q.as[Int].collect().sorted.toSeq === Seq(2, 3))
  }

  test("derivation survives column pruning (generated column absent " +
       "from the query output) and a plain SQL view read") {
    MvRewrite.install(spark)
    val (cat, sql) = warehouse()
    sql.sql("CREATE TABLE silver.pv (ts STRING, v INT, " +
      "day STRING GENERATED ALWAYS AS (substring(ts, 1, 10))) " +
      "PARTITIONED BY (day)")
    (1 to 4).foreach(i => sql.sql("INSERT INTO silver.pv (ts, v) VALUES " +
      s"('2026-01-0${i}T00:00', $i)"))
    cat.registerViews()
    val q = spark.sql(
      "SELECT sum(v) AS s FROM silver_pv WHERE ts >= '2026-01-03'")
    assert(q.as[Long].head() === 7L)
    assert(partsScanned(q) === 2)
    // unrelated table with the same column NAMES must not derive
    val other = tmpDir("gp-other-")
    val o = VersionedTable(spark, other)
    o.append(Seq(("2026-01-03T00:00", 10, "9999-99-99"))
      .toDF("ts", "v", "day"), partitionBy = Seq("day"))
    val oq = o.read.filter(col("ts") >= "2026-01-03")
    assert(!partFilters(oq).contains("day#") &&
      !partFilters(oq).contains("day >"),
      s"derived on an unregistered table: ${partFilters(oq)}")
    assert(oq.count() === 1L, "no generation declared — nothing derived")
  }
}
