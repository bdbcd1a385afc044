package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("chain, ring, and separate clusters all get the min-id label") {
    val out = comps(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),   // chain 1-2-3-4
      (10L, 11L), (11L, 12L), (12L, 10L), // ring 10-11-12
      (20L, 21L)))                    // pair
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("label propagates across a long chain (diameter > a few rounds)") {
    val chain = (0L until 12L).map(i => (i, i + 1))
    val out = comps(chain)
    assert(out.values.toSet === Set(0L))
    assert(out.size === 13)
  }

  test("minhashDedupTransitive keeps one doc per CHAIN cluster") {
    // doc i+1 drops 3 more trailing tokens: adjacent docs are near-dups
    // at 0.8 but the chain ends are not (27/30 ≈ 0.9, 24/30 = 0.8 vs
    // ends 24/30... use 4-doc chain: ends at 18/30 = 0.6 < 0.7)
    val toks = (0 until 30).map(j => s"t${j}_x")
    val docs = (0 until 4).map { i =>
      (i.toLong, toks.dropRight(3 * i).mkString(" "))
    }.toDF("doc_id", "text")
    val kept = Dedup.minhashDedupTransitive(docs, jaccardThreshold = 0.75)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(0L), s"expected only doc 0 kept, got $kept")
  }
}
