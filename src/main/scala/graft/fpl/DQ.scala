package graft.fpl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fail-fast data-quality gates — the reference's de-facto test suite
  * (SURVEY.md §2.9/§5). Each gate mirrors a reference check:
  *  - null-key gate       (31_build_silver_dims.py:281-284)
  *  - duplicate-key gate  (31_build_silver_dims.py:286-294; the gold
  *    variant short-circuits with limit(1): 41_publish_gold_dims.py:152-161)
  *  - parse-failure gate  (31_build_silver_dims.py:126-128,248-250)
  *  - empty-input gate    (31_build_silver_dims.py:24-25; 42:18-19)
  *
  * Scale: every gate is a single aggregate job with `limit(1)`
  * short-circuit where possible, so the cost is one scan (predicate-pushed)
  * — no collect of data rows to the driver.
  */
object DQ {

  final class DQException(msg: String) extends RuntimeException(msg)

  def assertNoNullKeys(df: DataFrame, key: String, name: String): Unit =
    if (df.where(col(key).isNull).limit(1).count() > 0)
      throw new DQException(s"DQ fail: $name has rows with NULL $key")

  def assertNoDuplicateKeys(df: DataFrame, name: String, keys: String*): Unit =
    if (df.groupBy(keys.map(col): _*).count()
          .where(col("count") > 1).limit(1).count() > 0)
      throw new DQException(
        s"DQ fail: $name has duplicate (${keys.mkString(",")}) values")

  /** Composite PK gate, the gold `assert_pk` (42:105-116). */
  def assertPk(df: DataFrame, key: String, name: String): Unit = {
    assertNoNullKeys(df, key, name)
    assertNoDuplicateKeys(df, name, key)
  }

  /** Parse-failure gate (Q3). The reference checks `from_json(...)
    * IS NULL` (31_build_silver_dims.py:126-128), but Spark 4's PERMISSIVE
    * `from_json` returns an all-null-fields struct — never a null struct —
    * for malformed input, which would make the literal check dead code.
    * `to_json` of that struct renders "{}" (or a null array for array
    * schemas), so we gate on that: same intent, alive on Spark 4. */
  def assertParsed(df: DataFrame, parsedCol: String, name: String): Unit =
    if (df.where(col(parsedCol).isNull ||
          to_json(col(parsedCol)).isin("{}", "[]")).limit(1).count() > 0)
      throw new DQException(
        s"DQ fail: $name JSON parse produced null/empty $parsedCol")

  def assertNonEmpty(df: DataFrame, name: String): Unit =
    if (df.limit(1).count() == 0)
      throw new DQException(s"DQ fail: $name is empty")

  /** Delta-Live-Tables-style EXPECTATIONS with quarantine routing: each
    * rule is (name, SQL predicate); a row PASSES when every predicate is
    * true-or-NULL (CHECK semantics). Returns (passed, quarantined) —
    * quarantined rows carry `_failed_expectations`, the array of rule
    * names they broke, so a quarantine table is debuggable row-by-row.
    * The DLT middle ground between `expect` (log and keep) and
    * `expect_or_fail` (the assert* gates above): bad rows leave the
    * pipeline without killing it, and nothing is silently dropped.
    *
    * One codegen'd projection computes all verdicts; both returned
    * frames filter the SAME lineage, so a caller writing passed+
    * quarantine reads the source twice (or persists it — their call);
    * no shuffle, no driver collect. */
  def expectations(df: DataFrame,
                   rules: Seq[(String, String)]): (DataFrame, DataFrame) = {
    val tagged = expectationsTagged(df, rules)
    (tagged.filter(size(col("_failed_expectations")) === 0)
       .drop("_failed_expectations"),
      tagged.filter(size(col("_failed_expectations")) > 0))
  }

  /** The tagged intermediate of [[expectations]]: every input row with
    * its `_failed_expectations` array (empty = passed). For single-pass
    * consumers — a pass/quarantine split of the two filtered frames
    * otherwise re-reads the source once per side. */
  def expectationsTagged(df: DataFrame,
                         rules: Seq[(String, String)]): DataFrame = {
    require(rules.nonEmpty, "expectations needs at least one rule")
    require(!df.columns.contains("_failed_expectations"),
      "input already carries _failed_expectations — re-validating a " +
        "quarantine frame would silently clobber its original verdicts")
    val failed = array_compact(array(rules.map { case (n, e) =>
      when(!coalesce(expr(e), lit(true)), lit(n))
    }: _*))
    df.withColumn("_failed_expectations", failed)
  }

  /** Non-throwing variant: one pass over the data computing all key checks,
    * for reporting pipelines (reference's validation unions,
    * 31_build_silver_dims.py:346-358). */
  def report(df: DataFrame, key: String, name: String): DataFrame =
    df.agg(
      lit(name).as("tbl"),
      count(lit(1)).as("n_rows"),
      sum(when(col(key).isNull, 1).otherwise(0)).as("null_keys"),
      (count(lit(1)) - countDistinct(col(key))).as("extra_duplicate_rows"),
    ).select("tbl", "n_rows", "null_keys", "extra_duplicate_rows")
}
