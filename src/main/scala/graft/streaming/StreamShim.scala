// Lives in Spark's namespace ON PURPOSE (file kept under graft/streaming
// for discoverability): V1 streaming `Source.getBatch` results must carry
// isStreaming=true — MicroBatchExecution asserts it — and the only
// constructor for such a frame, `SparkSession.internalCreateDataFrame`,
// is private[sql]. A one-method shim inside the sql package is the
// standard external-connector move (Delta's streaming source does the
// identical thing via DeltaLog.createDataFrame). No other internal API
// is touched.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.classic.Dataset

object StreamShim {

  /** Re-roots `df`'s physical plan under a streaming LogicalRDD. The RDD
    * is the frame's own compiled pipeline, so scan pushdown and codegen
    * are preserved; only the logical flag changes. */
  def asStreaming(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val c = df.asInstanceOf[Dataset[Row]]
    c.sparkSession.internalCreateDataFrame(
      c.queryExecution.toRdd, c.schema, isStreaming = true)
  }

  /** The inverse, for V1 `Sink.addBatch`: the micro-batch arrives as a
    * streaming-flagged frame that batch writers refuse ("streaming
    * sources must be executed with writeStream.start()"); re-root its
    * compiled pipeline as a batch frame (Delta's sink does the same). */
  def asBatch(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val c = df.asInstanceOf[Dataset[Row]]
    c.sparkSession.internalCreateDataFrame(
      c.queryExecution.toRdd, c.schema, isStreaming = false)
  }
}
