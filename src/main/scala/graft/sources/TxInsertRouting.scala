package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{InsertIntoDataSourceCommand, LogicalRelation}

/** Analyzer rule: route `INSERT INTO` a PARTITIONED-read tx relation
  * through the manifest protocol.
  *
  * Spark's own routing sends it elsewhere: `PreprocessTableInsertion`
  * fills the statement's partition spec from the relation's
  * partitionSchema, so `DataSourceAnalysis`'s `InsertableRelation` case
  * (which requires an EMPTY spec) no longer matches, and the insert
  * falls through to `InsertIntoHadoopFsRelationCommand` — a raw
  * parquet write into the table root behind the manifest's back: the
  * files land, no manifest references them, and the "successful" insert
  * is invisible to every tx read (observed, not hypothetical — the
  * TxDataSourceSpec coverage case caught it). The flat posture never
  * hits this (empty partitionSchema ⇒ empty spec ⇒ the
  * InsertableRelation case), which is why q195 worked while the
  * surfaced posture silently dropped rows.
  *
  * This rule runs in the analyzer's main resolution batch — BEFORE the
  * postHoc `PreprocessTableInsertion`/`DataSourceAnalysis` pair — and
  * claims the statement first, doing the positional align-and-cast
  * those rules would have done, then emitting the same
  * `InsertIntoDataSourceCommand` the flat posture gets. Partition
  * values travel IN the rows (the duplicate-tag layout), so a dynamic
  * `PARTITION (col)` clause is validated-and-dropped and a STATIC
  * `PARTITION (col=value)` clause refuses loudly rather than guessing
  * at hive semantics the manifest protocol doesn't have.
  *
  * Sessions built without [[graft.GraftExtensions]] don't get this
  * rule; there the raw write is stopped up-front by
  * [[TxParquetFileFormat.prepareWrite]]'s refusal — defense in depth,
  * loud in both layers, silent in neither.
  */
final case class TxInsertRouting(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case i @ InsertIntoStatement(
            l @ LogicalRelation(r: TxBatchRelation, _, _, _, _),
            parts, userCols, query, overwrite, ifPartitionNotExists, byName)
          if query.resolved && l.resolved &&
            r.partitionSchema.nonEmpty =>
        val surfacedCols = r.partitionSchema.fieldNames.toSeq
        if (ifPartitionNotExists) throw new IllegalArgumentException(
          "INSERT ... IF NOT EXISTS is not supported on tx tables — " +
            "partition existence is manifest metadata, not directory state")
        val static = parts.collect { case (k, Some(v)) => s"$k=$v" }
        if (static.nonEmpty) throw new IllegalArgumentException(
          s"static PARTITION spec (${static.mkString(", ")}) is not " +
            "supported on tx tables — partition values travel in the " +
            "rows themselves (the duplicate-tag layout); put the value " +
            "in the inserted rows")
        val unknown = parts.keys.filterNot(k =>
          surfacedCols.exists(_.equalsIgnoreCase(k)))
        if (unknown.nonEmpty) throw new IllegalArgumentException(
          s"PARTITION (${unknown.mkString(", ")}) does not match the " +
            s"table's partition columns (${surfacedCols.mkString(", ")})")
        if (byName || userCols.nonEmpty) throw new IllegalArgumentException(
          "INSERT ... BY NAME / column lists are not supported on " +
            "partitioned tx relations — insert positionally in the " +
            "table schema's column order")
        if (query.output.size != l.output.size)
          throw new IllegalArgumentException(
            s"INSERT provides ${query.output.size} columns, table has " +
              s"${l.output.size}")
        val aligned = Project(
          query.output.zip(l.output).map { case (in, out) =>
            Alias(Cast(in, out.dataType,
              Some(conf.sessionLocalTimeZone)), out.name)()
          }, query)
        InsertIntoDataSourceCommand(l, aligned, overwrite)
    }
}
