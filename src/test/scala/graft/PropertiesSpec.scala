package graft

import graft.ops.{Keyed, Merge}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based rerun-safety invariants (SURVEY.md §5): the reference's
  * idempotency contracts hold for arbitrary generated data, not just the
  * fixtures. Uses raw ScalaCheck generators with fixed seeds (the
  * scalatest-scalacheck bridge isn't on the offline classpath). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rows: Gen[List[(Int, Int, Double)]] =
    Gen.listOfN(30, Gen.zip(Gen.choose(0, 9), Gen.choose(0, 5),
      Gen.choose(0.0, 100.0)))

  private def samples(n: Int): Seq[List[(Int, Int, Double)]] =
    (1 to n).map(i =>
      rows(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(sys.error("gen failed")))

  test("property: merge(merge(t, u), u) == merge(t, u)") {
    for ((t, u) <- samples(5).zip(samples(5).reverse)) {
      val target = t.toDF("id", "ver", "v").dropDuplicates("id")
      val updates = u.toDF("id", "ver", "v").dropDuplicates("id")
      val once = Merge.upsert(target, updates, Seq("id"))
      val twice = Merge.upsert(once, updates, Seq("id"))
      assert(twice.collect().toSet === once.collect().toSet)
    }
  }

  test("property: bucketed COW merge == plain upsert of the full snapshot") {
    import graft.tables.VersionedTable
    for (((t, u), i) <- samples(4).zip(samples(4).reverse).zipWithIndex) {
      val target = t.toDF("id", "ver", "v").dropDuplicates("id")
      val updates = u.toDF("id", "ver", "v").dropDuplicates("id")
      val tbl = VersionedTable(spark, tmpDir(s"prop-cow-$i-"))
      tbl.merge(target, Seq("id"), numBuckets = 4)   // bootstrap, bucketed
      tbl.merge(updates, Seq("id"))                  // COW path
      val expected = Merge.upsert(target, updates, Seq("id"))
      assert(tbl.read.collect().toSet === expected.collect().toSet,
        s"COW merge diverged from reference upsert (sample $i)")
    }
  }

  test("property: append-with-guard twice == once (S7 dup-payload skip)") {
    for ((e, i) <- samples(5).zip(samples(5).reverse)) {
      val existing = e.toDF("id", "ver", "v").select("id").distinct()
      val incoming = i.toDF("id", "ver", "v").select("id").distinct()
      val afterOnce = existing.union(
        Keyed.notIn(incoming, existing, Seq("id"))).distinct()
      val afterTwice = afterOnce.union(
        Keyed.notIn(incoming, afterOnce, Seq("id"))).distinct()
      assert(afterTwice.as[Int].collect().toSet ===
        afterOnce.as[Int].collect().toSet)
    }
  }

  test("property: latestPerKey returns input rows, one per key") {
    for (rs <- samples(5)) {
      val df = rs.toDF("id", "ver", "v")
      val out = Keyed.latestPerKey(df, Seq("id"), "ver",
        tieBreakers = Seq("v")).collect()
      val inputSet = rs.toSet
      out.foreach { r =>
        assert(inputSet.contains((r.getInt(0), r.getInt(1), r.getDouble(2))))
      }
      assert(out.map(_.getInt(0)).distinct.length === out.length)
      assert(out.map(_.getInt(0)).toSet === rs.map(_._1).toSet)
    }
  }
}
