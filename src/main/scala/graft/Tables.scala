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
    normalizeTs(load(s, d, "events"))
  }

  /** Normalize an events-shaped `ts` column to TimestampType — see
    * [[events]] for the storage-flavor history.
    */
  def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        // integral DIV: ns→us must not round-trip through double (2^53 loss)
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
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
