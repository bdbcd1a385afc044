package graft.tables

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

import graft.SparkSpec

/** ALTER COLUMN TYPE — metadata-only lossless type widening: the empty
  * widened-schema arm coerces every older arm through the union fold,
  * while time travel keeps the pre-DDL shape. */
class WideningSpec extends SparkSpec {
  import spark.implicits._

  test("int -> bigint widens at read, old and new arms coexist") {
    val t = new VersionedTable(spark, tmpDir("graft-widen-") + "/t")
    t.append(Seq((1, 10), (2, 20)).toDF("k", "v"))
    val preV = t.latestVersion.get
    t.widenColumnType("v", LongType)
    assert(t.read.schema("v").dataType === LongType)
    // values beyond int range land after the DDL
    t.append(Seq((3L, 5_000_000_000L)).toDF("k", "v")
      .withColumn("k", col("k").cast("int")))
    assert(t.read.orderBy("k").as[(Int, Long)].collect().toSeq ===
      Seq((1, 10L), (2, 20L), (3, 5_000_000_000L)))
    // pre-DDL time travel shows the narrow type
    assert(t.readVersion(preV).schema("v").dataType === IntegerType)
    // DDL wrote zero data files: the new arm is schema-only
    assert(t.readVersion(preV + 1).count() === 2)
  }

  test("float -> double widens; narrowing and unknown columns refuse") {
    val t = new VersionedTable(spark, tmpDir("graft-widen-") + "/t")
    t.append(Seq((1, 1.5f)).toDF("k", "x"))
    t.widenColumnType("x", DoubleType)
    assert(t.read.schema("x").dataType === DoubleType)
    assert(t.read.as[(Int, Double)].head() === ((1, 1.5d)))
    val e1 = intercept[IllegalArgumentException](
      t.widenColumnType("k", org.apache.spark.sql.types.ByteType))
    assert(e1.getMessage.contains("lossless widening"))
    val e2 = intercept[RuntimeException](
      t.widenColumnType("nope", LongType))
    assert(e2.getMessage.contains("no column"))
  }

  test("widening a merge bucket key refuses (hash re-routing)") {
    val t = new VersionedTable(spark, tmpDir("graft-widen-") + "/t")
    t.append(Seq((1, "a")).toDF("k", "v"))
    t.merge(Seq((2, "b")).toDF("k", "v"), Seq("k"), numBuckets = 4)
    val e = intercept[IllegalArgumentException](
      t.widenColumnType("k", LongType))
    assert(e.getMessage.contains("bucket/partition key"))
    // a non-key column still widens on a merge table, and later merges
    // keep working against mixed-width arms
    val tv = new VersionedTable(spark, tmpDir("graft-widen-") + "/t2")
    tv.append(Seq(("a", 1)).toDF("k", "n"))
    tv.merge(Seq(("b", 2)).toDF("k", "n"), Seq("k"), numBuckets = 4)
    tv.widenColumnType("n", LongType)
    tv.merge(Seq(("a", 7_000_000_000L), ("c", 3L)).toDF("k", "n"), Seq("k"))
    assert(tv.read.orderBy("k").as[(String, Long)].collect().toSeq ===
      Seq(("a", 7_000_000_000L), ("b", 2L), ("c", 3L)))
  }

  test("CHECK-referenced columns refuse; CDF reads span the boundary") {
    val t = new VersionedTable(spark, tmpDir("graft-widen-") + "/t")
    t.enableChangeFeed()
    t.append(Seq((1, 10)).toDF("k", "v"))
    t.addCheck("k_pos", "k > 0")
    val e = intercept[IllegalArgumentException](
      t.widenColumnType("k", LongType))
    assert(e.getMessage.contains("referenced by"))
    t.widenColumnType("v", LongType)
    t.append(Seq((2, 9_000_000_000L)).toDF("k", "v")
      .withColumn("k", col("k").cast("int")))
    val feed = t.readChangeFeed(0L)
    assert(feed.schema("v").dataType === LongType)
    assert(feed.filter(col("_change_type") === "insert")
      .select("v").as[Long].collect().sorted.toSeq ===
      Seq(9_000_000_000L))
  }

  test("SQL surface: ALTER COLUMN TYPE routes to widenColumnType") {
    val cat = new Catalog(spark, tmpDir("graft-widen-sql-"))
    cat.bootstrap()
    val sql = GraftSql(spark, cat)
    val t = cat.table("silver", "w")
    t.append(Seq((1, 10)).toDF("k", "v"))
    val r = sql.sql("ALTER TABLE silver.w ALTER COLUMN v TYPE BIGINT")
      .as[(String, String)].head()
    assert(r === (("v", "bigint")))
    assert(t.read.schema("v").dataType === LongType)
  }
}
