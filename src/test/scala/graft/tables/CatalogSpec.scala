package graft.tables

import graft.SparkSpec

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("bootstrap is idempotent; views register; SQL can query; drop works") {
    val root = tmpDir("cat-")
    val cat = new Catalog(spark, root)
    cat.bootstrap()
    cat.bootstrap() // idempotent
    cat.table("silver", "team").overwrite(Seq((1, "Arsenal")).toDF("id", "name"))
    cat.table("gold", "dim_team").overwrite(Seq((1, "ARS")).toDF("id", "code"))
    assert(cat.tables === Seq(("silver", "team"), ("gold", "dim_team"))
      .sortBy(t => cat.Layers.indexOf(t._1)))
    val views = cat.registerViews()
    assert(views.toSet === Set("silver_team", "silver_team_history",
      "gold_dim_team", "gold_dim_team_history"))
    val n = spark.sql(
      "SELECT count(*) FROM silver_team JOIN gold_dim_team USING (id)")
      .as[Long].head()
    assert(n === 1)
    // DESCRIBE HISTORY surface: the version log is SQL-queryable
    val hist = spark.sql(
      "SELECT version, action FROM silver_team_history ORDER BY version")
      .as[(Long, String)].collect().toSeq
    assert(hist === Seq((0L, "overwrite")))
    cat.dropTable("gold", "dim_team")
    assert(cat.tables === Seq(("silver", "team")))
    assert(!spark.catalog.tableExists("gold_dim_team"))
  }

  test("unknown layer is rejected") {
    val cat = new Catalog(spark, tmpDir("cat-"))
    assertThrows[IllegalArgumentException](cat.table("platinum", "x"))
  }
}
