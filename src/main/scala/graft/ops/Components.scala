package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the operator that turns
  * near-dup PAIRS into dedup CLUSTERS (transitive closure), which
  * single-link pair collapsing approximates only for star-shaped
  * clusters.
  *
  * Algorithm: iterative min-label propagation, the standard Spark
  * formulation of distributed union-find (GraphX/GraphFrames use the
  * same shape). Every vertex starts labeled with its own id; each round
  * every vertex takes the minimum label in its closed neighborhood;
  * fixpoint when no label changes. Rounds = cluster diameter — small for
  * the chain/star clusters dedup produces (label-prop is O(diameter);
  * the large-star/small-star variant would make it O(log n) if ever
  * needed for long chains).
  *
  * Scale shape per round: ONE shuffle-join of the symmetrized edges with
  * the current labels (both hash-partitioned on vertex id) + one
  * min-aggregation. Lineage is cut every round with an eager
  * localCheckpoint so the plan stays bounded instead of growing by two
  * joins per iteration; the change count that drives convergence rides
  * the same materialization.
  */
object Components {

  def connectedComponents(edges: DataFrame, srcCol: String = "src",
                          dstCol: String = "dst",
                          maxIter: Int = 30): DataFrame = {
    // materialize the symmetrized edges ONCE: `edges` may be an expensive
    // pipeline (in minhashDedupTransitive it is the whole LSH candidate +
    // verify DAG) and is re-joined every round — without this cut each
    // round would recompute that entire lineage
    val sym = edges.select(col(srcCol).as("id"), col(dstCol).as("nbr"))
      .union(edges.select(col(dstCol).as("id"), col(srcCol).as("nbr")))
      .localCheckpoint()

    // one label-propagation hop: every vertex takes the min label in its
    // closed neighborhood
    def propagate(l: DataFrame): DataFrame = {
      val nbrMin = sym
        .join(l.select(col("id").as("nbr"), col("comp").as("nbr_comp")), "nbr")
        .groupBy("id").agg(min("nbr_comp").as("nbr_min"))
      l.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_min"), col("comp"))).as("comp"))
    }

    // convergence check: labels only ever DECREASE (least() includes the
    // vertex's own label), so the label sum is strictly monotone until
    // fixpoint — comparing sums is exact and costs one tiny aggregation
    // over the just-materialized round instead of a join + filter + count
    // job per round. decimal(38,0) so the sum can't overflow at any scale.
    def labelSum(l: DataFrame): java.math.BigDecimal =
      Option(l.agg(sum(col("comp").cast("decimal(38,0)")).as("s"))
        .head().getDecimal(0)) // null on an empty graph
        .getOrElse(java.math.BigDecimal.ZERO)
    var labels = sym.select("id").distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // TWO hops per materialization round: halves the checkpoint +
      // convergence-check actions for the same label spread
      val next = propagate(propagate(labels)).localCheckpoint()
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = next
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds " +
        s"(cluster diameter exceeds ${2 * maxIter} hops)")
    // checkpointed per-round label copies are freed by the ContextCleaner
    // once dereferenced; rounds = diameter/2, small for dedup clusters
    labels
  }
}
