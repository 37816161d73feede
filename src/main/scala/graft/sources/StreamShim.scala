/* Package-placed shim, graft code. A v1 streaming Source's getBatch
 * MUST return a DataFrame with isStreaming=true (MicroBatchExecution
 * asserts exactly that: "DataFrame returned by getBatch ... did not
 * have isStreaming=true"), and the only constructor for such a frame —
 * SparkSession.internalCreateDataFrame(rdd, schema, isStreaming) — is
 * private[sql]. Spark's own v1 file source calls it from inside the
 * sql package tree; a third-party v1 source needs the same doorway, so
 * this one object lives in org.apache.spark.sql.execution.streaming.
 * Nothing else of graft does.
 */
package org.apache.spark.sql.execution.streaming

import org.apache.spark.sql.{DataFrame, Row}

object GraftStreamShim {

  /** Re-root a BATCH DataFrame as a streaming one: same schema, the
    * batch plan's executed RDD as the micro-batch's content. Lazy — the
    * RDD materializes when the micro-batch runs, not here.
    */
  def asStreamingFrame(df: DataFrame): DataFrame = {
    val c = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    c.sparkSession.internalCreateDataFrame(
      c.queryExecution.toRdd, c.schema, isStreaming = true)
  }

  /** The inverse, for a v1 Sink's addBatch input: the micro-batch
    * Dataset is backed by an IncrementalExecution that batch writers
    * must not re-plan (Spark's own ForeachBatchSink re-roots it the
    * same way) — take its executed RDD as a plain batch frame.
    */
  def asBatchFrame(df: DataFrame): DataFrame = {
    val c = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    c.logicalPlan match {
      // a frame [[asStreamingFrame]] produced: its RDD is already the
      // executed batch — re-rooting through queryExecution would trip
      // the batch-mode streaming-leaf check, so unwrap directly
      case l: org.apache.spark.sql.execution.LogicalRDD if l.isStreaming =>
        c.sparkSession.internalCreateDataFrame(l.rdd, c.schema,
          isStreaming = false)
      case _ =>
        c.sparkSession.internalCreateDataFrame(
          c.queryExecution.toRdd, c.schema, isStreaming = false)
    }
  }
}
