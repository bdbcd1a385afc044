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

  test("latestChangePerKey: a version's delete ranks below its insert " +
       "(replace_where shape), later versions still win outright") {
    val feed = Seq(
      // k=1: replace_where at v5 — delete AND insert at ONE version;
      // the post-state has the key, so the insert must win the tie
      (1L, 5L, "delete", "old"),
      (1L, 5L, "insert", "new"),
      // k=2: updated at v3, deleted LATER at v6 — the delete wins
      (2L, 3L, "update_postimage", "mid"),
      (2L, 6L, "delete", "gone"),
      // k=3: inserted at v2, replaced at v4 (delete+insert), then a
      // plain update at v7 — the newest version wins over any rank
      (3L, 2L, "insert", "a"),
      (3L, 4L, "delete", "a"),
      (3L, 4L, "insert", "b"),
      (3L, 7L, "update_postimage", "c"))
      .toDF("k", "_commit_version", "_change_type", "v")
    val out = Keyed.latestChangePerKey(feed, Seq("k"),
        "_commit_version", "_change_type")
      .select("k", "_change_type", "v")
      .as[(Long, String, String)].collect()
      .map { case (k, ct, v) => k -> ((ct, v)) }.toMap
    assert(out(1L) === (("insert", "new")))
    assert(out(2L) === (("delete", "gone")))
    assert(out(3L) === (("update_postimage", "c")))
  }
}
