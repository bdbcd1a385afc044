package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling operators for training-data pipelines.
  *
  * Two flavors, per the standard corpus-construction playbook:
  *  - [[hashSample]]: DETERMINISTIC content-hash sampling — the same rows
  *    are selected on every run, on any engine, at any parallelism (the
  *    property train/eval splits need; Bernoulli `df.sample` draws differ
  *    per run/partitioning). Map-only predicate evaluated inside the scan
  *    stage (md5 can't push into parquet, but nothing shuffles).
  *  - [[stratifiedSample]]: per-stratum fractions via `df.stat.sampleBy`
  *    (seeded Bernoulli) — for rebalancing skewed strata where exact
  *    reproducibility across engines is not required.
  */
object Sampling {

  /** Keep rows whose key md5 falls in the first `sixteenths`/16 of hash
    * space (first hex nibble < threshold). md5 is identical everywhere, so
    * the selected set is portable across engines and runs — the DuckDB
    * oracle replays it exactly. */
  def hashSampleCond(key: Column, sixteenths: Int): Column = {
    require(sixteenths >= 1 && sixteenths <= 16, "sixteenths in [1,16]")
    val nibbles = "0123456789abcdef".take(sixteenths).map(_.toString)
    substring(md5(key.cast("string")), 1, 1).isin(nibbles: _*)
  }

  def hashSample(df: DataFrame, keyCol: String, sixteenths: Int): DataFrame =
    df.filter(hashSampleCond(col(keyCol), sixteenths))

  /** Arithmetic variant of [[hashSampleCond]] for NUMERIC row identities:
    * keeps rows where `key mod 16 < sixteenths`. Orders of magnitude
    * cheaper than md5 (one integer op vs a crypto digest per row) and just
    * as portable (`(a*P+b) % 16` replays identically in any engine for
    * non-negative inputs). Use when the row key is, or folds to, an
    * integer — e.g. `(doc_id, pos)` via [[foldKey]]; keep md5 for string
    * identities. A stride sample (every 16th run of `sixteenths`
    * consecutive key values) is exactly as good as a hash sample whenever
    * the sampled statistic is uncorrelated with key arithmetic — true for
    * row-identity keys by construction. */
  def arithmeticSampleCond(key: Column, sixteenths: Int): Column = {
    require(sixteenths >= 1 && sixteenths <= 16, "sixteenths in [1,16]")
    pmod(key.cast("long"), lit(16L)) < lit(sixteenths.toLong)
  }

  /** Fold a multi-part numeric row identity into one long for
    * [[arithmeticSampleCond]]: `((p1 * P + p2) * P + p3)…` with P a prime
    * large enough that distinct identities stay distinct for realistic
    * cardinalities (overflow-safe below ~9e12 for two parts — ANSI mode
    * would error loudly, not wrap, beyond that). */
  def foldKey(parts: Column*): Column = {
    require(parts.nonEmpty, "foldKey needs at least one part")
    parts.map(_.cast("long")).reduce((a, b) => a * lit(1000003L) + b)
  }

  /** Deterministic train/validation/test split by key hash: returns the
    * split label column ("train"/"val"/"test") from the md5 of the key —
    * stable under reruns, resharding, and engine changes. Fractions are in
    * 16ths (e.g. (12, 2, 2) → 75/12.5/12.5). */
  def splitLabel(key: Column, trainSixteenths: Int = 12,
                 valSixteenths: Int = 2): Column = {
    require(trainSixteenths + valSixteenths < 16, "leave room for test")
    val nib = substring(md5(key.cast("string")), 1, 1)
    val order = "0123456789abcdef"
    val trainSet = order.take(trainSixteenths).map(_.toString)
    val valSet = order.slice(trainSixteenths, trainSixteenths + valSixteenths)
      .map(_.toString)
    when(nib.isin(trainSet: _*), "train")
      .when(nib.isin(valSet: _*), "val")
      .otherwise("test")
  }

  /** Per-stratum seeded Bernoulli sampling (`sampleBy`). */
  def stratifiedSample(df: DataFrame, stratumCol: String,
                       fractions: Map[Any, Double],
                       seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Deterministic DOMAIN-MIXTURE sampling — the "sample web at 0.3,
    * books at 1.0, code at 0.8" step of corpus construction, with
    * [[hashSample]]'s portability: selection depends only on (key,
    * domain rate), not run/engine/partitioning, so mixes are
    * reproducible and the DuckDB oracle replays them exactly.
    *
    * Rates quantize to 1/65536 (first FOUR md5 nibbles compared as a hex
    * string — hex strings order like their values, so both engines need
    * only a lexical compare). Domains not in `rates` are dropped.
    * Map-only: the predicate is a when-chain over the (small) domain
    * list, evaluated in the scan stage, nothing shuffles. */
  def mixtureSampleCond(key: Column, domain: Column,
                        rates: Map[String, Double]): Column = {
    require(rates.values.forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val h4 = substring(md5(key.cast("string")), 1, 4)
    rates.foldLeft(lit(false)) { case (acc, (d, r)) =>
      // rates rounding UP to 65536 must short-circuit to keep-all: the
      // 5-char literal "10000" would otherwise compare lexically SMALLER
      // than most 4-char prefixes and keep only ~1/16 of a ~1.0 domain
      val t = math.round(r * 65536).toInt
      val cond =
        if (t >= 65536) lit(true)
        else h4 < lit(f"$t%04x")
      when(domain === d, cond).otherwise(acc)
    }
  }

  def mixtureSample(df: DataFrame, keyCol: String, domainCol: String,
                    rates: Map[String, Double]): DataFrame =
    df.filter(mixtureSampleCond(col(keyCol), col(domainCol), rates))

  /** Temperature-scaled mixture thresholds (the multilingual-sampling
    * recipe of Conneau & Lample 2019: target share of domain d ∝
    * n_d^α, α = 0.5 — upweights tail domains, downweights the head),
    * returning per-domain keep-thresholds in 1/65536 units for
    * [[mixtureSampleCond]]'s md5-prefix predicate.
    *
    * ENGINE-EXACT by construction: the only irrational step is sqrt
    * (IEEE-correctly-rounded in every implementation — general `pow`
    * is not), scaled to integer weights (`round(sqrt(n)·2^20)`), and
    * everything after is exact integer arithmetic (BigInt here, HUGEINT
    * in the DuckDB oracle) — no float summation order, no last-ulp
    * drift. rate_d = min(1, budget · w_d / (Σw · n_d)), rounded
    * half-up into 65536ths.
    *
    * Domains whose fair share exceeds their size clamp to keep-all
    * (their shortfall is not redistributed — the standard simple form;
    * re-run with a higher budget if exact totals matter). */
  def sqrtTemperatureThresholds(counts: Map[String, Long],
                                budget: Long): Map[String, Int] = {
    require(budget >= 0, "budget must be >= 0")
    require(counts.values.forall(_ > 0), "domain counts must be positive")
    val w: Map[String, BigInt] = counts.map { case (d, n) =>
      d -> BigInt(math.round(math.sqrt(n.toDouble) * 1048576L))
    }
    val wSum = w.values.sum
    counts.map { case (d, n) =>
      val num = BigInt(65536) * budget * w(d)
      val den = wSum * n
      val t = (num + den / 2) / den // half-up (all positive)
      d -> t.min(65536).toInt
    }
  }

  /** [[mixtureSample]] with rates derived from corpus counts by
    * temperature scaling — `counts` is the per-domain row count (one
    * tiny groupBy, collected driver-side by the caller). */
  def temperatureMixtureSample(df: DataFrame, keyCol: String,
                               domainCol: String, counts: Map[String, Long],
                               budget: Long): DataFrame =
    mixtureSample(df, keyCol, domainCol,
      sqrtTemperatureThresholds(counts, budget)
        .map { case (d, t) => d -> t / 65536.0 })
}
