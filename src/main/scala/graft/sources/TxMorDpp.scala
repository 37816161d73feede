package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{BaseRelation, TableScan}
import org.apache.spark.sql.types.{StructField, StructType}

import graft.operators.TxTable

/** DPP for MoR snapshots (r16 VERDICT task 3): `partitionedRead` used
  * to refuse any snapshot with live deletion vectors, so one
  * `deleteWhere` knocked a DPP-read fact table back to the flat posture
  * until a full rewrite. The composition that fixes it: keep ONE
  * partition-surfaced `HadoopFsRelation` scan over ALL files (DPP- and
  * partition-prune-eligible, vectorized), and apply the deletion
  * vectors ABOVE it as the same broadcast `(file, pos)` anti-join
  * `TxTable.readFilesWithDvs` runs — row identity comes from the scan's
  * own `_metadata.file_path`/`_metadata.row_index`, exactly the
  * coordinates `deleteWhere` recorded. Delta applies DVs inside its
  * custom scan; this is the same plan shape one operator higher, with
  * every scan-level mechanism (dynamic pruning included) intact
  * underneath.
  *
  * [[TxMorPartitionedSurrogate]] is the analysis-time handle: the
  * relation itself must never plan (a raw scan would RESURRECT deleted
  * rows), so it carries no scannable shape — [[TxMorDppRouting]]
  * (injected by GraftExtensions) rewrites its LogicalRelation into the
  * anti-join subplan during resolution, and the connector refuses the
  * posture up-front in sessions without the rule (the old purge-first
  * contract, now only for rule-less sessions and column-mapped
  * snapshots).
  */
final class TxMorPartitionedSurrogate(val spark: SparkSession,
    val root: String, val snap: TxTable.Snapshot,
    val opts: Map[String, String],
    val partitionFields: Seq[StructField])
    extends BaseRelation with TableScan {

  override def sqlContext: SQLContext = spark.sqlContext

  override val schema: StructType =
    TxDataSource.schemaOf(spark, root, snap)

  /** Never reached in a correctly-wired session; loud if it is. */
  override def buildScan(): RDD[Row] =
    throw new IllegalStateException(
      s"txtable $root: a MoR partitionedRead relation was planned " +
        "without the TxMorDppRouting rewrite — the raw scan would " +
        "resurrect deleted rows. Build the session with GraftExtensions")

  override def toString: String =
    s"TxMorPartitionedSurrogate[$root v${snap.version}]"
}

/** Analyzer rule: expand a [[TxMorPartitionedSurrogate]] into
  * partition-surfaced-scan + broadcast DV anti-join, remapping the
  * subplan's output onto the original relation's attribute ids so every
  * downstream reference resolves unchanged.
  */
final case class TxMorDppRouting(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case lr @ LogicalRelation(
            m: TxMorPartitionedSurrogate, _, _, _, _) =>
        val base = new TxBatchRelation(m.spark, m.root, m.snap,
          insertable = false, m.opts, m.partitionFields)
        val scanDf = m.spark.baseRelationToDataFrame(base)
        val dvFiles = m.snap.files.flatMap(f =>
          m.snap.dvs.getOrElse(f, Seq.empty).map(_._1)).distinct
        val dv = m.spark.read.parquet(
          dvFiles.map(f => TxTable.absFile(m.root, f)): _*)
          .select(col("file").as("__dv_file"), col("pos").as("__dv_pos"))
        // the same row coordinates deleteWhere recorded: root-relative
        // path + in-file row index, from the scan's own metadata struct
        val withMeta = scanDf
          .withColumn("__rel", concat(lit("data/"),
            substring_index(col("_metadata.file_path"), "/data/", -1)))
          .withColumn("__pos", col("_metadata.row_index"))
        val clean = withMeta.join(broadcast(dv),
            withMeta("__rel") === dv("__dv_file") &&
              withMeta("__pos") === dv("__dv_pos"), "left_anti")
          .select(m.schema.fieldNames.toIndexedSeq.map(col): _*)
        val sub = clean.queryExecution.analyzed
        Project(lr.output.zip(sub.output).map { case (orig, neo) =>
          Alias(neo, orig.name)(exprId = orig.exprId) }, sub)
    }
}
