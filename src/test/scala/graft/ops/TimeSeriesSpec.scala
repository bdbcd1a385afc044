package graft.ops

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  test("gapFillDaily: dense spine per key, LOCF fill") {
    val d = java.sql.Date.valueOf(_: String)
    val df = Seq(
      ("a", d("2024-01-01"), Some(1.0)),
      ("a", d("2024-01-04"), Some(4.0)),
      ("b", d("2024-02-10"), Some(7.0))).toDF("k", "day", "v")
    val out = TimeSeries.gapFillDaily(df, "k", "day", Seq("v"))
      .select("k", "day", "v_filled")
      .as[(String, java.sql.Date, Double)].collect()
      .map(r => (r._1, r._2.toString) -> r._3).toMap
    assert(out.size === 5) // a: 4 days, b: 1 day
    assert(out(("a", "2024-01-01")) === 1.0)
    assert(out(("a", "2024-01-02")) === 1.0) // carried forward
    assert(out(("a", "2024-01-03")) === 1.0)
    assert(out(("a", "2024-01-04")) === 4.0)
    assert(out(("b", "2024-02-10")) === 7.0)
  }
}
