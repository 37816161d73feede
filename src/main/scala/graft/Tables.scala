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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Read it as raw nanos (legacy conf, set
    * per-session at runtime so any session origin works) and convert to a
    * proper micros TimestampType column — truncation matches DuckDB's
    * ns→us cast semantics, keeping the oracle comparable.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral DIV: ns→us must not round-trip through double (2^53 loss)
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
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
