package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining dataloaders: documents are laid
  * end-to-end in a deterministic order and cut into fixed token-budget
  * chunks (concat-and-chunk — the standard way training sequences are
  * formed; a document straddling a boundary is split across sequences).
  *
  * The core primitive is an EXACT DISTRIBUTED PREFIX SUM. A naive
  * `sum().over(Window.orderBy(...))` with no partition key collapses the
  * whole table into ONE task — the classic accidental scale-killer. Here
  * it is the textbook two-phase scan instead:
  *   1. range-bucket rows on the order column (driver-side quantile cuts,
  *      one pass) and cumsum WITHIN each bucket (parallel windows),
  *   2. roll the per-bucket totals into running offsets driver-side
  *      (`numBuckets` longs — metadata-sized) and add them back as a
  *      literal map lookup. No stage sees more than 1/numBuckets of the
  *      data in one task.
  */
object Packing {

  /** `df` plus `runningCol` = exact inclusive prefix sum of `valueCol` in
    * `orderCol` order. `orderCol` values must be unique (they define the
    * total order; ties would make "prefix" ambiguous). */
  def withRunningTotal(df: DataFrame, orderCol: String, valueCol: String,
                       runningCol: String = "running_total",
                       numBuckets: Int = 32): DataFrame = {
    // equi-depth bucket cuts on the ORDER column: bucketing must agree
    // with the sort order for per-bucket prefixes to compose
    val nCuts = math.max(1, numBuckets - 1)
    val cuts = df.stat
      .approxQuantile(orderCol, (1 to nCuts).map(_.toDouble / numBuckets).toArray, 0.001)
      .distinct.sorted
    val bucket: Column = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(col(orderCol).cast("double") > c, 1).otherwise(0)
    }
    val bucketed = df.withColumn("__psb", bucket)
    val inBucket = sum(col(valueCol).cast("long"))
      .over(Window.partitionBy("__psb").orderBy(orderCol)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    // per-bucket totals -> running offsets: numBuckets rows to the driver
    val totals = bucketed.groupBy("__psb")
      .agg(sum(col(valueCol).cast("long")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = { // exclusive: bucket b's offset = sum of totals below b
      var acc = 0L
      totals.keys.toSeq.sorted.map { b =>
        val o = (b, acc); acc += totals(b); o
      }.toMap
    }
    val offsetExpr = element_at(typedlit(offsets), col("__psb"))
    bucketed
      .withColumn(runningCol, offsetExpr + inBucket)
      .drop("__psb")
  }

  /** Concat-and-chunk packing: per document, its [start, end) token span
    * in the concatenated stream and the chunk ids it lands in.
    * `budget` = tokens per training sequence. */
  def packChunks(docs: DataFrame, orderCol: String, tokenCol: String,
                 budget: Long, numBuckets: Int = 32): DataFrame = {
    require(budget > 0, "budget must be positive")
    withRunningTotal(docs, orderCol, tokenCol, "__end", numBuckets)
      .withColumn("start_offset", col("__end") - col(tokenCol))
      .withColumn("first_chunk", floor(col("start_offset") / budget))
      .withColumn("last_chunk",
        when(col(tokenCol) > 0, floor((col("__end") - 1) / budget))
          .otherwise(floor(col("start_offset") / budget)))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1)
      .drop("__end")
  }

  /** Per-document sliding-window chunking with overlap — the RAG /
    * context-window preparation shape (vs [[packChunks]], which packs
    * ACROSS documents): each document's whitespace tokens split into
    * windows of `chunkTokens` starting every `chunkTokens - overlap`
    * tokens. A start position past `n - overlap` emits nothing (its
    * window would be a pure suffix of the previous one — the standard
    * sliding-window stop rule). MAP-ONLY: sequence + filter + posexplode
    * inside one projection, no shuffle, no state — the plan scales as a
    * pure scan. Output: (original columns…, chunk_ix, chunk_text,
    * chunk_tokens). Whitespace-only documents emit nothing. */
  def chunkWithOverlap(docs: DataFrame, textCol: String,
                       chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got ($chunkTokens, $overlap)")
    val step = chunkTokens - overlap
    // boundary empties filtered: split on "\s+" keeps an empty token at
    // each non-space-trimmed edge (trailing "\n" is ubiquitous in real
    // corpora), which would inflate counts and shift every window
    docs
      .withColumn("__toks",
        filter(split(col(textCol), "\\s+"), t => t =!= lit("")))
      .filter(size(col("__toks")) > 0) // whitespace-only docs emit nothing
      .select(col("*"), posexplode(filter(
        sequence(lit(0), size(col("__toks")) - 1, lit(step)),
        s => s === 0 || s < size(col("__toks")) - overlap))
        .as(Seq("chunk_ix", "__s")))
      .withColumn("__chunk",
        slice(col("__toks"), col("__s") + 1, lit(chunkTokens)))
      .withColumn("chunk_text", array_join(col("__chunk"), " "))
      .withColumn("chunk_tokens", size(col("__chunk")))
      .drop("__toks", "__s", "__chunk")
  }
}
