package graft.plans

import graft.SparkSpec
import graft.tables.{Catalog, GraftSql}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

/** [[JoinElim]]: RELY key constraints eliminate dim joins whose columns
  * the query never uses — the BI rollup shape at 100 TB. */
class JoinElimSpec extends SparkSpec {
  import spark.implicits._

  private def joins(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.length

  private def warehouse(): (Catalog, GraftSql) = {
    val cat = new Catalog(spark, tmpDir("graft-je-"))
    cat.bootstrap()
    MvRewrite.install(spark)
    val sql = GraftSql(spark, cat)
    val dim = cat.table("silver", "team")
    dim.append(Seq((1, "red"), (2, "blue"), (3, "green"))
      .toDF("team", "color"))
    val fact = cat.table("silver", "pts")
    fact.append(Seq((1, 10L), (1, 20L), (2, 5L), (3, 7L))
      .toDF("team", "p"))
    (cat, sql)
  }

  test("LEFT join to a RELY-PK dim eliminates when no dim column is " +
       "used; dim filters don't block it; non-RELY never fires") {
    val (cat, sql) = warehouse()
    val fact = cat.table("silver", "pts")
    val dim = cat.table("silver", "team")
    def q: DataFrame = fact.read
      .join(dim.read, Seq("team"), "left")
      .agg(sum("p").as("s"), count(lit(1)).as("n"))
    // no constraint yet: the join stays
    assert(joins(q) === 1)
    // a PK WITHOUT RELY must not fire (informational only)
    sql.sql("ALTER TABLE silver.team ADD CONSTRAINT pk_team " +
      "PRIMARY KEY (team) NOT ENFORCED")
    assert(joins(q) === 1)
    sql.sql("ALTER TABLE silver.team DROP CONSTRAINT pk_team")
    sql.sql("ALTER TABLE silver.team ADD CONSTRAINT pk_team " +
      "PRIMARY KEY (team) RELY")
    assert(joins(q) === 0, "RELY PK left-join must eliminate")
    assert(q.as[(Long, Long)].head() === ((42L, 4L)))
    // a FILTERED dim still eliminates on the LEFT path (matches only
    // shrink below one — left rows are kept either way)
    val filtered = fact.read
      .join(dim.read.filter(col("color") =!= "red"), Seq("team"), "left")
      .agg(sum("p").as("s"))
    assert(joins(filtered) === 0)
    assert(filtered.as[Long].head() === 42L)
    // using a dim column blocks elimination
    val uses = fact.read.join(dim.read, Seq("team"), "left")
      .groupBy("color").agg(sum("p"))
    assert(joins(uses) === 1)
    // DROP CONSTRAINT un-arms immediately
    sql.sql("ALTER TABLE silver.team DROP CONSTRAINT pk_team")
    assert(joins(q) === 1)
  }

  test("INNER join eliminates to an IS NOT NULL filter only under a " +
       "RELY FK onto the dim's RELY PK; filtered dims and missing FKs " +
       "block it; NULL fact keys stay excluded") {
    val (cat, sql) = warehouse()
    val dim = cat.table("silver", "team")
    // a separate fact with a NULL-keyed row IN the same schema
    // generation: inner join drops it, elimination must too
    val fact = cat.table("silver", "ptsn")
    fact.append(Seq((Option(1), 10L), (Option(1), 20L), (Option(2), 5L),
      (Option(3), 7L), (Option.empty[Int], 99L)).toDF("team", "p"))
    sql.sql("ALTER TABLE silver.team ADD CONSTRAINT pk_team " +
      "PRIMARY KEY (team) RELY")
    def q: DataFrame = fact.read
      .join(dim.read, Seq("team"), "inner")
      .agg(sum("p").as("s"), count(lit(1)).as("n"))
    // PK alone is not enough for INNER (a fact key missing from the
    // dim would change the result — only the FK asserts it can't)
    assert(joins(q) === 1)
    sql.sql("ALTER TABLE silver.ptsn ADD CONSTRAINT fk_team " +
      "FOREIGN KEY (team) REFERENCES silver.team RELY")
    assert(joins(q) === 0, "RELY FK onto RELY PK must eliminate INNER")
    assert(q.as[(Long, Long)].head() === ((42L, 4L)),
      "the NULL-keyed row must stay excluded (IS NOT NULL rewrite)")
    // a FILTERED dim blocks the INNER path (a filter can drop matches)
    val filtered = fact.read
      .join(dim.read.filter(col("color") =!= "red"), Seq("team"))
      .agg(sum("p").as("s"))
    assert(joins(filtered) === 1)
    // impersonation: a computed alias posing as the pk never matches
    val fake = fact.read
      .join(dim.read.select(col("color").as("team")), Seq("team"))
      .agg(count(lit(1)))
    assert(joins(fake) === 1)
  }

  test("star schema: every unused RELY-PK dim falls out of the join " +
       "tree in one optimization (fixed-point cascade)") {
    val (cat, sql) = warehouse()
    val venue = cat.table("silver", "venue")
    venue.append(Seq((1, "north"), (2, "south"), (3, "east"))
      .toDF("team", "v"))
    sql.sql("ALTER TABLE silver.team ADD CONSTRAINT pk_team " +
      "PRIMARY KEY (team) RELY")
    sql.sql("ALTER TABLE silver.venue ADD CONSTRAINT pk_venue " +
      "PRIMARY KEY (team) RELY")
    val fact = cat.table("silver", "pts")
    val q = fact.read
      .join(cat.table("silver", "team").read, Seq("team"), "left")
      .join(venue.read, Seq("team"), "left")
      .agg(sum("p").as("s"))
    assert(joins(q) === 0, "both dim joins must cascade away")
    assert(q.as[Long].head() === 42L)
  }
}
