package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic lake (TESTDATA.md).
  *
  * Mirrors the reference's silver-layer table registry
  * (`Notebooks/Transform Silver Data.py:47-65` reads 12 parquet datasets by
  * name); here the catalog is the TPC-H-ish star schema plus the
  * LLM-pipeline tables (`documents`, `embeddings`).
  *
  * Scale note: `spark.read.parquet` is a single deterministic scan per
  * table; Catalyst handles column pruning + predicate pushdown into the
  * scan, so callers should NOT pre-`select` defensively — declare the full
  * query and let the optimizer prune (verified via `.explain("formatted")`:
  * `ReadSchema` only lists referenced columns).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations (Spark's vectorized reader rejects it — read as raw nanos
    * via the legacy conf and truncate ns→us, matching DuckDB cast
    * semantics) and as TIMESTAMP(micros, isAdjustedToUTC=false) in others
    * (Spark reads TIMESTAMP_NTZ, which `unix_micros`/`window` reject).
    * Normalize every generation to session-TZ TimestampType (sessions run
    * UTC, so NTZ→TZ preserves the instant) — callers never branch on the
    * storage flavor.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    assertEventsTsFlavor(s, s"$d/events.parquet")
    normalizeTs(load(s, d, "events"))
  }

  /** Canary against the NEXT silent testdata regeneration (r10 VERDICT
    * task 7; the r9 one broke all 14 events queries): the parquet footer
    * must annotate `ts` as a TIMESTAMP. Spark-level types alone cannot
    * distinguish int64 NANOS (normalized by DIV 1000) from a plain
    * unannotated BIGINT of millis/micros — both surface as LongType
    * under the nanosAsLong conf, and the wrong guess is off by 10⁶
    * silently. A driver-side footer read settles it for free.
    */
  private[graft] def assertEventsTsFlavor(s: SparkSession,
      path: String): Unit = {
    val hconf = s.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    // events ships as a single file; accept a directory of parts too
    val file =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".parquet")).minBy(_.getName.toString)
      else p
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, hconf))
    val t = try r.getFooter.getFileMetaData.getSchema
      .getType(Array("ts"): _*) finally r.close()
    val ann = t.asPrimitiveType().getLogicalTypeAnnotation
    val known = ann != null && ann.isInstanceOf[
      org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation]
    // INT96 is the pre-annotation legacy timestamp — also a timestamp
    val int96 = t.asPrimitiveType().getPrimitiveTypeName ==
      org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96
    if (!known && !int96) throw new IllegalStateException(
      s"new events ts flavor: parquet footer type '$t' (annotation " +
        s"$ann) is not a TIMESTAMP — a regenerated events.parquet " +
        "changed storage again (r9 precedent: nanos int64 → micros " +
        "TIMESTAMP_NTZ). Decide its unit explicitly and extend " +
        "Tables.normalizeTs; do NOT let it flow through as a bare " +
        "number.")
  }

  /** Normalize an events-shaped `ts` column to TimestampType — see
    * [[events]] for the storage-flavor history. The match is EXHAUSTIVE
    * over the flavors that have actually shipped; an unknown type throws
    * (loudly, with the type) instead of flowing through and failing 14
    * queries downstream with cryptic per-query errors.
    */
  def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        // TIMESTAMP(NANOS) read under nanosAsLong (the ≤ r8 flavor);
        // integral DIV: ns→us must not round-trip through double (2^53
        // loss). Tables.events' footer canary guarantees the annotation
        // really was a timestamp before this branch is trusted.
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        // TIMESTAMP(MICROS, isAdjustedToUTC=false), the ≥ r9 flavor;
        // sessions run UTC so NTZ→TZ preserves the instant
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other => throw new IllegalStateException(
        s"new events ts flavor: Spark type $other for column 'ts' — " +
          "known flavors are int64 nanos (≤ r8 testdata, LongType " +
          "under nanosAsLong), TIMESTAMP_NTZ micros (≥ r9), and " +
          "session-TZ TimestampType. Add an explicit normalization " +
          "for this type (r9 postmortem: a silent flavor change broke " +
          "all 14 events queries at once).")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (analogue of the reference's
    * `saveAsTable('silver.<t>')` loop, `Transform Silver Data.py:79-87`,
    * without a persistent metastore — the SQL surface is identical).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
