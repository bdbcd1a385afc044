package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream (the classic product
  * analytics operator: how many entities reached step k, where step k
  * counts only if it happens AT/AFTER that entity's step k-1 time).
  *
  * Shuffle shape: one groupBy per step on the entity key plus an
  * entity-keyed join per step — all hash-partitioned on the same key, so
  * at cluster scale consecutive stages reuse the partitioning; the
  * per-step "reached" relations shrink monotonically (each is a subset of
  * the previous step's entities), and AQE broadcasts them once they fit. */
object Funnel {

  /** Per-entity first-reach time of each step. Returns one row per step:
    * (step, step_type, n_entities). */
  def funnelCounts(events: DataFrame, entityCol: String, typeCol: String,
                   tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var reached: DataFrame = null // (entityCol, __t): first time step i reached
    val stageCounts = steps.zipWithIndex.map { case (stepType, i) =>
      val evs = events.filter(col(typeCol) === stepType)
      val stepDf =
        if (i == 0)
          evs.groupBy(col(entityCol)).agg(min(col(tsCol)).as("__t"))
        else
          evs.join(reached.withColumnRenamed("__t", "__prev"), entityCol)
            .filter(col(tsCol) >= col("__prev"))
            .groupBy(col(entityCol)).agg(min(col(tsCol)).as("__t"))
      reached = stepDf
      stepDf.agg(
        lit(i + 1).cast("int").as("step"),
        lit(stepType).as("step_type"),
        count(lit(1)).as("n_entities"))
    }
    stageCounts.reduce(_.unionByName(_)).orderBy("step")
  }
}
