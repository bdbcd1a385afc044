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

  test("sqrtTemperatureThresholds: exact integer math, clamped tails") {
    // sqrt(10000)=100, sqrt(100)=10 — exact weights, hand-derivable:
    // share(a)=100/110, rate(a)=2000*(100/110)/10000=2/11 →
    // round(2/11*65536)=11916; rate(b)=2000*(10/110)/100=20/11 → clamp
    val t = Sampling.sqrtTemperatureThresholds(
      Map("a" -> 10000L, "b" -> 100L), budget = 2000L)
    assert(t === Map("a" -> 11916, "b" -> 65536))
  }

  test("temperatureMixtureSample matches an independent JVM-md5 replay") {
    val df = spark.range(12000).select(col("id"),
      when(col("id") % 100 === 0, "tail").otherwise("head").as("domain"))
    val counts = Map("head" -> 11880L, "tail" -> 120L)
    val out = Sampling
      .temperatureMixtureSample(df, "id", "domain", counts, budget = 3000L)
      .groupBy("domain").count().as[(String, Long)].collect().toMap
    // tail upweights: fair share 3000*(sqrt120/(sqrt11880+sqrt120)) ≈ 274
    // > 120 → clamped keep-all
    assert(out("tail") === 120L)
    // head: replay the kept set independently with java.security md5
    val thr = Sampling.sqrtTemperatureThresholds(counts, 3000L)("head")
    val mdt = java.security.MessageDigest.getInstance("MD5")
    val expectHead = (0L until 12000L).count { i =>
      i % 100 != 0 && {
        val h = mdt.digest(i.toString.getBytes("UTF-8"))
          .take(2).map("%02x".format(_)).mkString
        h < f"$thr%04x"
      }
    }
    assert(out("head") === expectHead.toLong)
  }
}
