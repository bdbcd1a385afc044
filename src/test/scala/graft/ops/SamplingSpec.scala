package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids = spark.range(2000).select(col("id"))

  test("hashSample is deterministic and close to the nominal fraction") {
    val once = Sampling.hashSample(ids.toDF(), "id", 2)
      .as[Long].collect().toSet
    val again = Sampling.hashSample(ids.toDF(), "id", 2)
      .as[Long].collect().toSet
    assert(once === again)
    // 2/16 = 12.5% nominal; md5 is uniform so allow a generous band
    assert(once.size > 2000 * 0.08 && once.size < 2000 * 0.18,
      s"got ${once.size} of 2000")
    // repartitioning does not change the selected set
    val reshuffled = Sampling.hashSample(ids.repartition(7).toDF(), "id", 2)
      .as[Long].collect().toSet
    assert(reshuffled === once)
  }

  test("splitLabel partitions every row into exactly one split") {
    val labeled = ids.select(col("id"),
      Sampling.splitLabel(col("id")).as("split"))
    val counts = labeled.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum === 2000L)
    // 12/2/2 sixteenths → train should dominate
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // deterministic: same assignment on rerun
    val again = ids.select(Sampling.splitLabel(col("id")).as("split"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again === counts)
  }

  test("stratifiedSample respects per-stratum fractions (seeded)") {
    val df = spark.range(4000)
      .select(col("id"), (col("id") % 2 === 0).as("stratum"))
    val out = Sampling.stratifiedSample(df, "stratum",
      Map(true -> 0.5, false -> 0.1))
    val byStratum = out.groupBy("stratum").count()
      .as[(Boolean, Long)].collect().toMap
    assert(byStratum(true) > 800 && byStratum(true) < 1200)
    assert(byStratum(false) > 100 && byStratum(false) < 320)
  }

  test("mixtureSample: per-domain rates, deterministic, unlisted dropped") {
    val df = spark.range(30000).select(col("id"),
      element_at(typedlit(Seq("web", "books", "code")),
        (col("id") % 3).cast("int") + 1).as("domain"))
    val rates = Map("web" -> 0.25, "books" -> 1.0)
    val out = Sampling.mixtureSample(df, "id", "domain", rates)
    val byDomain = out.groupBy("domain").count()
      .as[(String, Long)].collect().toMap
    assert(byDomain("books") === 10000L) // rate 1.0 keeps every row
    assert(byDomain("web") > 2100 && byDomain("web") < 2900) // ~2500
    assert(!byDomain.contains("code")) // unlisted domain dropped
    // deterministic: a second evaluation selects the identical set
    val a = out.select("id").as[Long].collect().toSet
    val b = Sampling.mixtureSample(df, "id", "domain", rates)
      .select("id").as[Long].collect().toSet
    assert(a === b)
    // a rate rounding UP to 1.0 (65536/65536) keeps EVERYTHING — the
    // 5-char "10000" hex literal must not sneak into the lexical compare
    val nearOne = Sampling.mixtureSample(df, "id", "domain",
      Map("web" -> 0.999999))
    assert(nearOne.count() === 10000L)
  }
}
