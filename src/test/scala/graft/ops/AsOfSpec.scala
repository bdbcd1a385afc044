package graft.ops

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  // price snapshots per asset
  private def prices = Seq(
    ("A", 10L, 100.0), ("A", 20L, 110.0), ("A", 30L, 90.0),
    ("B", 15L, 50.0),
  ).toDF("asset", "ts", "price")

  // trades to enrich with the prevailing price
  private def trades = Seq(
    ("A", 5L, 1),   // before any snapshot
    ("A", 10L, 2),  // exactly at a snapshot -> inclusive
    ("A", 25L, 3),  // between snapshots -> ts=20
    ("A", 99L, 4),  // after the last -> ts=30
    ("B", 14L, 5),  // before B's only snapshot
    ("B", 16L, 6),
  ).toDF("asset", "ts", "trade_id")

  test("backward as-of join picks the latest snapshot at or before ts") {
    val out = AsOf.asofJoinBackward(trades, prices, Seq("asset"), "ts")
      .select("trade_id", "asof_price").as[(Int, Double)].collect().toMap
    assert(out === Map(2 -> 100.0, 3 -> 110.0, 4 -> 90.0, 6 -> 50.0))
  }

  test("left as-of join keeps unmatched rows with null payload") {
    val out = AsOf.asofJoinBackward(trades, prices, Seq("asset"), "ts",
      joinType = "left")
      .select("trade_id", "asof_price").as[(Int, Option[Double])]
      .collect().toMap
    assert(out(1) === None)
    assert(out(5) === None)
    assert(out(3) === Some(110.0))
    assert(out.size === 6)
  }

  test("NULL keys never match (SQL semantics); left join passes them through") {
    val p = Seq((Some("A"), 10L, 100.0), (None, 5L, 999.0))
      .toDF("asset", "ts", "price")
    val t = Seq((Some("A"), 20L, 1), (None, 20L, 2))
      .toDF("asset", "ts", "trade_id")
    val inner = AsOf.asofJoinBackward(t, p, Seq("asset"), "ts")
      .select("trade_id").as[Int].collect().toSet
    assert(inner === Set(1)) // null-key trade matches nothing
    val leftJ = AsOf.asofJoinBackward(t, p, Seq("asset"), "ts",
      joinType = "left")
      .select("trade_id", "asof_price").as[(Int, Option[Double])]
      .collect().toMap
    assert(leftJ === Map(1 -> Some(100.0), 2 -> None))
  }

  test("reserved and colliding column names are rejected loudly") {
    assertThrows[IllegalArgumentException] {
      AsOf.asofJoinBackward(trades.withColumnRenamed("trade_id", "__side"),
        prices, Seq("asset"), "ts")
    }
    assertThrows[IllegalArgumentException] {
      AsOf.asofJoinBackward(
        trades.withColumnRenamed("trade_id", "asof_price"),
        prices, Seq("asset"), "ts")
    }
  }

  test("as-of join shuffles exactly once") {
    val q = AsOf.asofJoinBackward(trades, prices, Seq("asset"), "ts")
    val p = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"as-of join should be a single shuffle:\n$p")
    assert(!p.contains("NestedLoop"), s"degenerated to nested loop:\n$p")
  }
}
