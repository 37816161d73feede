package org.apache.spark.sql.execution.datasources.v2

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, InSet, Literal}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.execution.datasources.{PartitionDirectory, PartitioningAwareFileIndex, PartitionSpec}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** graft's DataSource V2 bridge (r19 spike — the r18 verdict's task 7).
  *
  * Lives in Spark's namespace for the same reason [[org.apache.spark
  * .sql.execution.streaming.GraftStreamShim]] does: the pieces a
  * LOG-BACKED v2 file source must compose — [[PartitioningAwareFileIndex]]
  * (whose constructor takes the private[sql] FileStatusCache default),
  * [[ParquetScanBuilder]]/[[ParquetScan]] (Spark's own vectorized
  * parquet v2 scan — re-implementing its reader stack would be both
  * slower and a correctness liability), and the private[sql]
  * [[SupportsPushDownCatalystFilters]] push surface — are not reachable
  * from user packages. Everything here is thin delegation; the
  * manifest semantics stay in `graft.sources.TxFileIndex`.
  *
  * What the v2 shape buys over the v1 connector (measured in
  * TxV2Spec / SCALE.md):
  *   - DYNAMIC PARTITION PRUNING without the `TxMorDppRouting`
  *     surrogate: [[TxV2Scan]] implements [[SupportsRuntimeFiltering]],
  *     so Spark's PartitionPruning rule targets the scan directly and
  *     `BatchScanExec` re-plans the partition list through the manifest
  *     index at runtime — no resolution-rule injection, no surrogate
  *     expansion.
  *   - native pushdown wiring: Catalyst pushes filters/required columns
  *     straight into the ParquetScanBuilder, and the same expressions
  *     drive manifest pruning via the index's `listFiles`.
  */
object GraftTxV2Shim {

  /** [[PartitioningAwareFileIndex]] facade over graft's manifest index:
    * `listFiles` IS the manifest prune (delegated — stat/sstat/bloom/
    * part evaluation all happen there), `partitionSpec` surfaces the
    * recorded partition columns for the partitioned posture (its
    * partition LIST stays empty: the base class only consults it from
    * code paths this facade overrides).
    */
  final class TxV2FileIndex(spark: SparkSession,
      val inner: org.apache.spark.sql.execution.datasources.FileIndex,
      partCols: StructType)
      extends PartitioningAwareFileIndex(spark, Map.empty, None) {

    override def rootPaths: Seq[Path] = inner.rootPaths

    override def refresh(): Unit = inner.refresh()

    override def sizeInBytes: Long = inner.sizeInBytes

    override def inputFiles: Array[String] = inner.inputFiles

    override def partitionSchema: StructType = partCols

    override def partitionSpec(): PartitionSpec =
      PartitionSpec(partCols, Seq.empty)

    override def listFiles(partitionFilters: Seq[Expression],
        dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
      inner.listFiles(partitionFilters, dataFilters)

    override def leafFiles: mutable.LinkedHashMap[Path, FileStatus] = {
      val m = new mutable.LinkedHashMap[Path, FileStatus]()
      inner.listFiles(Nil, Nil)
        .foreach(_.files.foreach(f => m.put(f.getPath, f.fileStatus)))
      m
    }

    override def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
      leafFiles.values.toSeq.groupBy(_.getPath.getParent)
        .map { case (d, fs) => d -> fs.toArray }
  }

  /** ScanBuilder delegating the push surfaces to Spark's own
    * [[ParquetScanBuilder]] and wrapping the result in [[TxV2Scan]]
    * (which adds runtime filtering). The catalyst-filter push is what
    * routes the query's predicates into the manifest index: the
    * builder records them as the scan's dataFilters/partitionFilters,
    * and `FileScan.partitions` hands them to `listFiles`.
    */
  final class TxV2ScanBuilder(spark: SparkSession, index: TxV2FileIndex,
      schema: StructType, options: CaseInsensitiveStringMap)
      extends ScanBuilder with SupportsPushDownCatalystFilters
      with SupportsPushDownRequiredColumns {

    private val pb = ParquetScanBuilder(spark, index, schema, schema, options)

    override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
      pb.pushFilters(filters)

    override def pushedFilters: Array[Predicate] = pb.pushedFilters

    override def pruneColumns(requiredSchema: StructType): Unit =
      pb.pruneColumns(requiredSchema)

    override def build(): Scan =
      new TxV2Scan(pb.build().asInstanceOf[ParquetScan], index)
  }

  /** The published scan: Spark's vectorized [[ParquetScan]] plus
    * [[SupportsRuntimeFiltering]] over the surfaced partition columns.
    * `filter` translates the runtime IN/EQ predicates into catalyst
    * expressions appended to the delegate's partitionFilters — the
    * SAME seam static partition predicates take — and re-plans; the
    * manifest index then drops every partition the broadcast's keys
    * cannot touch before one task launches.
    */
  final class TxV2Scan(delegate: ParquetScan, index: TxV2FileIndex)
      extends Scan with Batch with SupportsRuntimeFiltering
      with SupportsReportStatistics {

    @volatile private var runtime: ParquetScan = delegate

    override def readSchema: StructType = delegate.readSchema()

    override def toBatch: Batch = this

    override def description(): String =
      s"GraftTxV2 ${delegate.description()}"

    override def estimateStatistics(): Statistics =
      runtime.estimateStatistics()

    override def filterAttributes(): Array[NamedReference] =
      index.partitionSchema.fieldNames.map(Expressions.column)

    override def filter(filters: Array[Filter]): Unit = {
      val exprs = filters.toSeq.flatMap(toCatalyst)
      if (exprs.nonEmpty)
        runtime = delegate.copy(
          partitionFilters = delegate.partitionFilters ++ exprs)
    }

    /** Runtime filters arrive as v1 [[Filter]]s over the declared
      * filterAttributes; unknown shapes are simply not applied (the
      * join re-applies the exact predicate — pruning only ever removes
      * provably-dead partitions).
      */
    private def toCatalyst(f: Filter): Option[Expression] = {
      def attr(name: String): Option[AttributeReference] =
        index.partitionSchema.fields.find(_.name == name)
          .map(sf => AttributeReference(sf.name, sf.dataType)())
      f match {
        case In(name, values) => attr(name).map(a =>
          InSet(a, values.map(v =>
            Literal.create(v, a.dataType).value).toSet))
        case EqualTo(name, value) => attr(name).map(a =>
          org.apache.spark.sql.catalyst.expressions.EqualTo(
            a, Literal.create(value, a.dataType)))
        case _ => None
      }
    }

    override def planInputPartitions(): Array[InputPartition] =
      runtime.toBatch.planInputPartitions()

    override def createReaderFactory(): PartitionReaderFactory =
      runtime.toBatch.createReaderFactory()
  }
}
