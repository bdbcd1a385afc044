package graft.tables

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Named snapshot tags: durable pins, vacuum exemption, SQL surface. */
class TagsSpec extends SparkSpec {
  import spark.implicits._

  test("tags pin versions durably; re-point refused; drop frees the name") {
    val t = new VersionedTable(spark, tmpDir("graft-tag-") + "/t")
    t.append(Seq((1, "a")).toDF("k", "v")) // v0
    t.append(Seq((2, "b")).toDF("k", "v")) // v1
    t.createTag("rel-1", Some(0L))
    t.createTag("rel-2") // head
    assert(t.tags === Map("rel-1" -> 0L, "rel-2" -> 1L))
    assert(t.readTag("rel-1").as[(Int, String)].collect().toSeq ===
      Seq((1, "a")))
    val e = intercept[IllegalArgumentException](t.createTag("rel-1", Some(1L)))
    assert(e.getMessage.contains("never re-point"))
    t.dropTag("rel-1")
    assert(t.tags === Map("rel-2" -> 1L))
    intercept[RuntimeException](t.readTag("rel-1"))
    // a fresh instance on the same root sees the same tags (durable)
    assert(new VersionedTable(spark, t.root).tags === Map("rel-2" -> 1L))
  }

  test("tagged versions are exempt from the vacuum retention cliff") {
    val t = new VersionedTable(spark, tmpDir("graft-tag-") + "/t")
    t.append(Seq((1, "a")).toDF("k", "v"))    // v0
    t.overwrite(Seq((2, "b")).toDF("k", "v")) // v1 — v0's set now stale
    t.overwrite(Seq((3, "c")).toDF("k", "v")) // v2
    t.createTag("pinned", Some(0L))
    val reclaimed = t.vacuum(retainVersions = 1)
    // v1's file-set goes; v0's stays (tagged), v2's stays (retained)
    assert(reclaimed.nonEmpty)
    assert(t.readTag("pinned").as[(Int, String)].collect().toSeq ===
      Seq((1, "a")))
    // dropping the tag exposes v0 to the next vacuum
    t.dropTag("pinned")
    assert(t.vacuum(retainVersions = 1).nonEmpty)
    intercept[Exception](t.readVersion(0L).collect())
  }

  test("SQL: CREATE/DROP/SHOW TAGS and VERSION AS OF '<tag>'") {
    val cat = new Catalog(spark, tmpDir("graft-tagsql-"))
    cat.bootstrap()
    val sql = GraftSql(spark, cat)
    val t = cat.table("silver", "rel")
    t.append(Seq((1, "a")).toDF("k", "v"))
    t.append(Seq((2, "b")).toDF("k", "v"))
    val r = sql.sql("ALTER TABLE silver.rel CREATE TAG v1.0 AS OF VERSION 0")
      .as[(String, Long)].head()
    assert(r === (("v1.0", 0L)))
    sql.sql("ALTER TABLE silver.rel CREATE TAG latest")
    assert(sql.sql("SHOW TAGS silver.rel").as[(String, Long)]
      .collect().toSeq === Seq(("latest", 1L), ("v1.0", 0L)))
    // quoted tag form of time travel, old vs new in one statement
    cat.registerViews()
    val both = sql.sql(
      "SELECT (SELECT count(*) FROM silver.rel VERSION AS OF 'v1.0') AS n0, " +
        "(SELECT count(*) FROM silver.rel VERSION AS OF 'latest') AS n1")
      .as[(Long, Long)].head()
    assert(both === ((1L, 2L)))
    sql.sql("ALTER TABLE silver.rel DROP TAG v1.0")
    assert(sql.sql("SHOW TAGS silver.rel").count() === 1L)
  }

  test("RESTORE TABLE ... TO TAG rolls the head back to the pinned version") {
    val cat = new Catalog(spark, tmpDir("graft-tagrst-"))
    cat.bootstrap()
    val sql = GraftSql(spark, cat)
    val t = cat.table("silver", "rb")
    t.append(Seq((1, "a")).toDF("k", "v"))
    sql.sql("ALTER TABLE silver.rb CREATE TAG good")
    t.overwrite(Seq((9, "bad")).toDF("k", "v"))
    sql.sql("RESTORE TABLE silver.rb TO TAG 'good'")
    assert(t.read.as[(Int, String)].collect().toSeq === Seq((1, "a")))
    val e = intercept[RuntimeException](
      sql.sql("RESTORE TABLE silver.rb TO TAG 'nope'"))
    assert(e.getMessage.contains("no tag"))
  }
}
