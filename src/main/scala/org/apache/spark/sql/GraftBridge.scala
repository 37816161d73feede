package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's package-private Column↔Expression seam
  * (`org.apache.spark.sql.classic.ExpressionUtils` is `private[sql]` in
  * Spark 4). This is the standard third-party-extension technique for
  * exposing custom Catalyst `Expression`s through the public Column API.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** DataFrame from a custom LogicalPlan (`Dataset.ofRows` is
    * `private[sql]`) — the seam custom whole-operator nodes need.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Reliable-checkpoint directories backing `df`'s plan. After
    * `df.checkpoint(true)` the returned Dataset is a [[execution.LogicalRDD]]
    * over the checkpointed RDD, whose `getCheckpointFile` names the exact
    * `rdd-<id>` directory it wrote — EXACT ownership attribution, replacing
    * a before/after filesystem listing diff (which needed a driver-wide
    * lock across the whole checkpoint job to be race-free).
    */
  def checkpointFiles(df: DataFrame): Set[String] =
    df.queryExecution.analyzed.collect {
      case l: execution.LogicalRDD => l.rdd.getCheckpointFile
    }.flatten.toSet
}
