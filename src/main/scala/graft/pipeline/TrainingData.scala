package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end training-data curation pipeline — the composition a user
  * of this library actually runs: quality gate → exact dedup → split
  * assignment → per-(lang, split) accounting. Every stage is one of the
  * engine's oracled operators; the composed pipeline is itself oracled
  * (q77), so the driver verifies the whole flow, not just the parts.
  *
  * Scale: the quality gate and split assignment are narrow codegen'd
  * passes; dedup is one shuffle on the content hash; the accounting is
  * one map-side-combined aggregation. Near-dup clustering (q26/q71) and
  * chunking (q35) slot in between dedup and split in production —
  * excluded here only because their custom-hash stages have no SQL twin
  * for the composed oracle.
  */
object TrainingData {

  /** Quality gate: cheap pretraining heuristics (token count bounds,
    * punctuation cleanliness, repetition). Returns docs + keep flag with
    * the failed-gate reason (training pipelines log WHY a doc dropped).
    */
  def withQualityGate(docs: DataFrame): DataFrame = {
    val toks = expr("regexp_extract_all(text, '\\\\S+', 0)")
    docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("distinct_ratio",
        when(col("n_tokens") === 0, 0.0)
          .otherwise(size(array_distinct(toks)).cast("double") / col("n_tokens")))
      .withColumn("punct_ratio",
        when(length(col("text")) === 0, 0.0)
          .otherwise((length(col("text")) -
            length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("double") /
            length(col("text"))))
      .withColumn("drop_reason",
        when(col("n_tokens") < 10, "too_short")
          .when(col("n_tokens") > 5000, "too_long")
          .when(col("punct_ratio") >= 0.1, "punct")
          .when(col("distinct_ratio") <= 0.3, "repetitive")
          .otherwise(null))
  }

  /** Exact dedup: keep the lowest doc_id per content hash. */
  def dedupExact(docs: DataFrame): DataFrame = {
    val keep = docs.groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep_id"))
      .select(col("keep_id").as("doc_id"), lit(true).as("is_canonical"))
    docs.join(keep, Seq("doc_id"), "left")
      .withColumn("is_canonical", coalesce(col("is_canonical"), lit(false)))
  }

  /** Deterministic 80/10/10 split (q51's overflow-safe bucket map). */
  val splitCol =
    when(pmod(pmod(col("doc_id"), lit(100L)) * 61L, lit(100L)) < 80, "train")
      .when(pmod(pmod(col("doc_id"), lit(100L)) * 61L, lit(100L)) < 90, "val")
      .otherwise("test")

  /** q77: the composed pipeline's accounting — per (lang, split):
    * kept docs, per-reason drops, dedup removals, kept token volume.
    */
  def q77Pipeline(s: SparkSession, d: String): DataFrame = {
    val gated = dedupExact(withQualityGate(Tables.documents(s, d)))
      .withColumn("split", splitCol)
    gated.groupBy("lang", "split")
      .agg(
        count(when(col("drop_reason").isNull && col("is_canonical"), true))
          .as("n_kept"),
        count(when(col("drop_reason") === "too_short", true)).as("n_too_short"),
        count(when(col("drop_reason") === "repetitive", true)).as("n_repetitive"),
        count(when(col("drop_reason").isNull && !col("is_canonical"), true))
          .as("n_dup_removed"),
        sum(when(col("drop_reason").isNull && col("is_canonical"),
          col("n_tokens")).otherwise(0L)).as("kept_tokens"))
      .orderBy("lang", "split")
  }

  val q77Sql: String =
    """WITH gated AS (
      |  SELECT doc_id, lang, text,
      |    len(regexp_extract_all(text, '\S+')) AS n_tokens,
      |    CASE WHEN len(regexp_extract_all(text, '\S+')) = 0 THEN 0.0
      |         ELSE CAST(len(list_distinct(regexp_extract_all(text, '\S+'))) AS DOUBLE)
      |              / len(regexp_extract_all(text, '\S+')) END AS distinct_ratio,
      |    CASE WHEN LENGTH(text) = 0 THEN 0.0
      |         ELSE CAST(LENGTH(text) -
      |                LENGTH(REGEXP_REPLACE(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
      |              / LENGTH(text) END AS punct_ratio
      |  FROM documents),
      |reasons AS (
      |  SELECT *,
      |    CASE WHEN n_tokens < 10 THEN 'too_short'
      |         WHEN n_tokens > 5000 THEN 'too_long'
      |         WHEN punct_ratio >= 0.1 THEN 'punct'
      |         WHEN distinct_ratio <= 0.3 THEN 'repetitive'
      |         ELSE NULL END AS drop_reason
      |  FROM gated),
      |canon AS (
      |  SELECT MIN(doc_id) AS doc_id FROM reasons GROUP BY md5(text)),
      |flagged AS (
      |  SELECT r.*, c.doc_id IS NOT NULL AS is_canonical,
      |    CASE WHEN ((r.doc_id % 100) * 61) % 100 < 80 THEN 'train'
      |         WHEN ((r.doc_id % 100) * 61) % 100 < 90 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM reasons r LEFT JOIN canon c ON r.doc_id = c.doc_id)
      |SELECT lang, split,
      |  COUNT(CASE WHEN drop_reason IS NULL AND is_canonical THEN 1 END) AS n_kept,
      |  COUNT(CASE WHEN drop_reason = 'too_short' THEN 1 END) AS n_too_short,
      |  COUNT(CASE WHEN drop_reason = 'repetitive' THEN 1 END) AS n_repetitive,
      |  COUNT(CASE WHEN drop_reason IS NULL AND NOT is_canonical THEN 1 END)
      |    AS n_dup_removed,
      |  CAST(SUM(CASE WHEN drop_reason IS NULL AND is_canonical THEN n_tokens
      |           ELSE 0 END) AS BIGINT) AS kept_tokens
      |FROM flagged GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q77_pipeline" -> (q77Pipeline _))

  val oracles: Map[String, String] = Map(
    "q77_pipeline" -> q77Sql)
}
