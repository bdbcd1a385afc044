package graft.ops

import graft.SparkSpec

class KeyedSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // (user, ts, event_id)
    (1, 10L, "a"), (1, 20L, "b"), (1, 20L, "c"),
    (2, 5L, "d"),
    (3, 7L, "e"), (3, 6L, "f"),
  ).toDF("user_id", "ts", "event_id")

  test("latestPerKey keeps max-ts row, tie broken by ascending tiebreaker") {
    val out = Keyed.latestPerKey(events, Seq("user_id"), "ts",
      tieBreakers = Seq("event_id"))
      .select("user_id", "event_id").as[(Int, String)].collect().toSet
    // user 1: ts=20 tie between b and c -> b (asc); user 3: ts=7 -> e
    assert(out === Set((1, "b"), (2, "d"), (3, "e")))
  }

  test("firstPerKey keeps min-order row deterministically") {
    val out = Keyed.firstPerKey(events, Seq("user_id"), "ts",
      tieBreakers = Seq("event_id"))
      .select("user_id", "event_id").as[(Int, String)].collect().toSet
    assert(out === Set((1, "a"), (2, "d"), (3, "f")))
  }

  test("notIn drops rows whose key exists (the S7 dup-payload guard)") {
    val incoming = Seq((1, "x"), (2, "y"), (4, "z")).toDF("user_id", "v")
    val existing = Seq(1, 2, 3).toDF("user_id")
    val out = Keyed.notIn(incoming, existing, Seq("user_id"))
      .select("user_id").as[Int].collect().toSet
    assert(out === Set(4))
  }

  test("notIn applied twice is idempotent (append-twice == append-once)") {
    val incoming = Seq((1, "x"), (4, "z")).toDF("user_id", "v")
    val existing = Seq(1, 2).toDF("user_id")
    val once = Keyed.notIn(incoming, existing, Seq("user_id"))
    val appended = existing.select("user_id")
      .union(once.select("user_id"))
    val again = Keyed.notIn(incoming, appended, Seq("user_id"))
    assert(again.count() === 0)
  }
}
