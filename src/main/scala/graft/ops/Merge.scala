package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-based MERGE upsert — the engine's implementation of the reference's
  * declared `MERGE INTO silver.live_event` semantics
  * (notebooks/03_silver/32_merge_silver_live_event.sql is empty; key spec at
  * resources/uc/objects.sql:137-149, rerun-safety at docs/backlog.md:49-51).
  *
  * WHEN MATCHED → take the update row; WHEN NOT MATCHED → insert the update
  * row; target rows with no update pass through unchanged.
  *
  * Scale notes: both sides hash-partition on `keys` (one shuffle each, the
  * same movement Delta's MERGE performs); if the update side is small Spark's
  * AQE broadcasts it. Callers must ensure updates are unique per key
  * (VersionedTable.merge dedups first), keeping the join 1:1.
  *
  * NULL keys never match (plain equality, as in SQL/Delta `MERGE ON`): a
  * NULL-keyed update row takes the insert path and a NULL-keyed target row
  * passes through unchanged.
  */
object Merge {

  /** Marker column for merge-with-delete (`WHEN MATCHED AND <marker> THEN
    * DELETE`, the clause DLT's APPLY CHANGES INTO is built on): an update
    * batch may carry this extra boolean column; a `true` row removes its
    * matched target row and contributes nothing itself (an unmatched
    * delete is a no-op). The column never reaches stored data. */
  val DeleteCol = "__graft_delete"

  /** Pad each side with typed NULL columns for fields only the other side
    * has (Delta `mergeSchema`/autoMerge-style ADDITIVE evolution), so a
    * feed that gained a column — e.g. `_rescued_data` appearing after a
    * producer schema change — merges into a pre-evolution target instead
    * of crashing, and vice versa. Column ORDER follows target-then-new.
    * [[DeleteCol]] on the update side is carried through, never padded
    * onto the target. */
  def alignForEvolution(target: DataFrame, updates: DataFrame): (DataFrame, DataFrame) = {
    val tFields = target.schema.fields
    val uFields = updates.schema.fields.filterNot(_.name == DeleteCol)
    val tNames = tFields.map(_.name).toSet
    val uNames = uFields.map(_.name).toSet
    val t2 = uFields.filterNot(f => tNames.contains(f.name))
      .foldLeft(target)((d, f) =>
        d.withColumn(f.name, lit(null).cast(f.dataType)))
    val order = t2.columns.toSeq ++
      (if (updates.columns.contains(DeleteCol)) Seq(DeleteCol) else Nil)
    val u2 = tFields.filterNot(f => uNames.contains(f.name))
      .foldLeft(updates)((d, f) =>
        d.withColumn(f.name, lit(null).cast(f.dataType)))
      .select(order.map(col): _*)
    (t2, u2)
  }

  /** `updateExprs`: Delta's `WHEN MATCHED THEN UPDATE SET c = expr(t, u)`
    * — per-column (targetValue, updateValue) => newValue combiners applied
    * ONLY on matched rows (e.g. `"cnt" -> (t + u)` turns the merge into
    * incremental aggregate maintenance). Unlisted columns take the update
    * row's value; inserts always take the update row. */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String],
             updateExprs: Map[String, (Column, Column) => Column] = Map.empty): DataFrame =
    upsertWithLineage(target, updates, keys, updateExprs)
      .filter(!col("__delete_req"))
      .select(target.columns.toSeq.map(col): _*)

  /** [[upsert]]'s full-outer merge frame WITH its lineage kept: the merged
    * values (identical projection to `upsert`) plus, per row, the
    * target-side pre-image values as `__pre_<c>` and the two match flags
    * `__t_present`/`__u_present` (never NULL). ONE join thus yields both
    * the new snapshot AND the change-feed classification —
    * matched rows are `__t_present && __u_present` (pre-image from the
    * `__pre_` columns, post-image from the merged columns), inserts are
    * `__u_present && !__t_present` — which is how VersionedTable.merge
    * folds its CDF pre-image pass into the COW join instead of re-joining
    * target and updates per change type. */
  def upsertWithLineage(target: DataFrame, updates: DataFrame, keys: Seq[String],
                        updateExprs: Map[String, (Column, Column) => Column] = Map.empty): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    val cols = target.columns.toSeq
    val withDeletes = updates.columns.contains(DeleteCol)
    require(updates.columns.toSeq == cols ++ (if (withDeletes) Seq(DeleteCol) else Nil),
      s"merge schema mismatch: target=${cols.mkString(",")} updates=${updates.columns.mkString(",")}; " +
        "use alignForEvolution for additive schema changes")
    require(!cols.contains(DeleteCol),
      s"target must not contain the $DeleteCol marker column")
    require(updateExprs.keySet.subsetOf(cols.toSet),
      s"updateExprs reference unknown columns: ${updateExprs.keySet -- cols}")
    require(updateExprs.keySet.intersect(keys.toSet).isEmpty,
      "updateExprs cannot rewrite merge key columns")

    val t = cols.foldLeft(target)((d, c) => d.withColumnRenamed(c, s"__t_$c"))
      .withColumn("__t_present", lit(true))
    val u = cols.foldLeft(updates)((d, c) => d.withColumnRenamed(c, s"__u_$c"))
      .withColumn("__u_present", lit(true))
    val joinCond = keys.map(k => t(s"__t_$k") === u(s"__u_$k")).reduce(_ && _)

    t.join(u, joinCond, "full_outer")
      .select(cols.map { c =>
        // Presence flag (not coalesce of the value columns) decides the
        // side, so an update that sets a non-key column to NULL wins.
        val base = when(col("__u_present"), col(s"__u_$c"))
          .otherwise(col(s"__t_$c"))
        updateExprs.get(c) match {
          case Some(f) =>
            when(col("__u_present") && col("__t_present"),
              f(col(s"__t_$c"), col(s"__u_$c"))).otherwise(base).as(c)
          case None => base.as(c)
        }
      } ++ cols.map(c => col(s"__t_$c").as(s"__pre_$c")) ++ Seq(
        coalesce(col("__t_present"), lit(false)).as("__t_present"),
        coalesce(col("__u_present"), lit(false)).as("__u_present"),
        // delete request: an update row marked for deletion (target-only
        // rows coalesce to false). The caller filters these (and their
        // matched targets — same row after the join) from the snapshot.
        (if (withDeletes) coalesce(col(DeleteCol), lit(false))
         else lit(false)).as("__delete_req")): _*)
  }
}
