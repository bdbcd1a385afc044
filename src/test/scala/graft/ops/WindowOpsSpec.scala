package graft.ops

import graft.SparkSpec

class WindowOpsSpec extends SparkSpec {
  import spark.implicits._

  private def snaps = Seq(
    // (entity, day, value, id)
    (1, 1, 10.0, "a"), (1, 2, 13.0, "b"), (1, 3, 11.0, "c"),
    (2, 1, 5.0, "d"),
  ).toDF("k", "day", "v", "id")

  test("snapshotDeltas computes lag diffs per entity") {
    val out = WindowOps.snapshotDeltas(snaps, "k", "day", "v", "id")
      .select("k", "id", "prev_value", "delta")
      .as[(Int, String, Option[Double], Option[Double])].collect().toSet
    assert(out === Set(
      (1, "a", None, None),
      (1, "b", Some(10.0), Some(3.0)),
      (1, "c", Some(13.0), Some(-2.0)),
      (2, "d", None, None)))
  }

  test("rollingMean uses a bounded rows frame") {
    val out = WindowOps.rollingMean(snaps, "k", "day", "v", 2, "id")
      .select("id", "rolling_mean_2", "window_rows")
      .as[(String, Double, Long)].collect()
      .map { case (id, m, n) => (id, (m, n)) }.toMap
    assert(out("a") === ((10.0, 1L)))
    assert(out("b") === ((11.5, 2L)))
    assert(out("c") === ((12.0, 2L))) // (13+11)/2, frame excludes day 1
  }
}
