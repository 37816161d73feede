package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.v2.GraftTxV2Shim
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.TxTable

/** `format("txv2")` — the DataSource V2 READ path for TxTables (r19
  * spike, the r18 verdict's task 7). A separate format name IS the
  * option flag: `format("tx")` keeps the proven v1 surface (writers,
  * streaming, MoR/column-mapped composition, INSERT routing), while
  * this provider exercises the v2 shape the verdict scoped — a
  * [[TableProvider]] whose scan implements SupportsRuntimeFiltering,
  * so DYNAMIC PARTITION PRUNING works without the `TxMorDppRouting`
  * surrogate + resolution rule, and pushdown/column pruning arrive
  * through the native v2 surfaces.
  *
  * Spike scope (refusals are LOUD): batch reads of CLEAN snapshots
  * only — live deletion vectors or a column mapping keep routing
  * through `format("tx")` (whose composed relations own those
  * semantics); writers and streaming stay v1. Supported options:
  * `versionAsOf` time travel and `partitionedRead` (surfaces recorded
  * part values as the table's partitioning — the DPP posture).
  * Everything manifest-semantic (stat/sstat/bloom/part pruning) is the
  * SAME [[TxFileIndex]] the v1 path plans through; the v2 layer is
  * pure wiring, which is the point of the spike: measure what the
  * connector shape changes, not the pruning.
  */
final class TxV2DataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "txv2"

  override def supportsExternalMetadata(): Boolean = false

  private def spark: SparkSession = SparkSession.active

  // one resolution per load: Spark calls inferSchema then getTable on
  // the SAME provider instance, and resolving twice both paid a second
  // O(F) snapshot resolution and opened a race — a commit landing
  // between the two calls would pin the table to a DIFFERENT snapshot
  // than the schema was inferred from (an Overwrite with a changed
  // column set would read nulls). Keyed by the normalized options so a
  // reused provider with different options re-resolves.
  @volatile private var lastResolve:
    (Map[String, String], (String, TxTable.Snapshot, Seq[StructField])) = null

  private def resolve(options: CaseInsensitiveStringMap)
      : (String, TxTable.Snapshot, Seq[StructField]) = {
    val opts = TxDataSource.normalize(
      options.asCaseSensitiveMap().asScala.toMap)
    val hit = lastResolve
    if (hit != null && hit._1 == opts) return hit._2
    val r = resolveFresh(opts)
    lastResolve = (opts, r)
    r
  }

  private def resolveFresh(opts: Map[String, String])
      : (String, TxTable.Snapshot, Seq[StructField]) = {
    val root = TxDataSource.rootOf(opts)
    val snap = opts.get("versionasof") match {
      case Some(v) => TxTable.snapshotAt(root, v.toLong)
      case None => TxTable.currentSnapshot(root).getOrElse(
        throw new java.io.IOException(
          s"txtable $root has no committed version"))
    }
    require(!snap.files.exists(snap.dvs.contains) &&
      snap.renames.isEmpty && snap.deadCols.isEmpty,
      s"format(\"txv2\") reads CLEAN snapshots only (r19 spike scope) — " +
        s"txtable $root carries live deletion vectors or a column " +
        "mapping; read it through format(\"tx\"), or purgeDeletes()/" +
        "optimize() first")
    val surfaced =
      if (opts.get("partitionedread").exists(_.toBoolean)) {
        val fields = TxDataSource.surfacedPartitionFields(
          TxDataSource.schemaOf(spark, root, snap), snap)
        require(fields.nonEmpty, s"txtable $root: partitionedRead found " +
          "no surfaceable partition column — every snapshot file must " +
          "carry a recorded part value of a whitelisted type")
        fields
      } else Nil
    (root, snap, surfaced)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (root, snap, _) = resolve(options)
    TxDataSource.schemaOf(spark, root, snap)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val (root, snap, surfaced) = resolve(options)
    new TxV2Table(spark, root, snap, schema, surfaced)
  }
}

/** One snapshot-pinned v2 table. The [[GraftTxV2Shim.TxV2FileIndex]]
  * wraps the SAME manifest-pruning [[TxFileIndex]] the v1 relations
  * plan through — `index.lastPruned` stays the spec seam for "which
  * files did the pushed filters keep".
  */
final class TxV2Table(spark: SparkSession, root: String,
    snap: TxTable.Snapshot, tableSchema: StructType,
    surfaced: Seq[StructField]) extends Table with SupportsRead {

  /** The manifest index — public so specs pin the pruned file set from
    * the REAL planned scan, exactly like the v1 seam.
    */
  val index = new TxFileIndex(root, snap, surfaced)

  private val v2Index = new GraftTxV2Shim.TxV2FileIndex(
    spark, index, StructType(surfaced))

  override def name(): String = s"txv2:$root@v${snap.version}"

  override def schema(): StructType = tableSchema

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def partitioning(): Array[Transform] =
    surfaced.map(f => Expressions.identity(f.name)).toArray

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    new GraftTxV2Shim.TxV2ScanBuilder(spark, v2Index, tableSchema, options)
}
