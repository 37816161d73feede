package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-12 additions to the LLM-pipeline surface. */
object Advanced9 {

  // ---------------------------------------------------------------- q170
  // Document repetition profile — the Gopher repetition heuristics
  // (Rae et al. '21 §A1.1: duplicate-content and top-n-gram fractions)
  // that q151's rule gate does not cover, adapted to this corpus' flat
  // word streams (no line structure): per document,
  //   dup  = 1 − |distinct words| / |words|        (duplicate-word mass)
  //   top2 = max bigram frequency / (|words| − 1)  (top-2-gram fraction)
  // Both are computed as EXACT integer rationals — ×10⁹ with integer
  // division for the reported averages, cross-multiplied comparisons for
  // the flags (dup > 0.68, top2 > 0.08, calibrated to the corpus' p90 so
  // both rules have real failures) — so the DuckDB oracle is arithmetic-
  // identical, no float-summation hazard. Thresholding repetition is the
  // canonical pre-training filter for boilerplate/spam documents.
  //
  // Scale posture: one narrow pass for the per-doc word counts; the
  // bigram mode is one (doc_id, bigram) hash aggregate (map-side
  // combinable — bigram multiplicity collapses before the exchange) and
  // one (doc_id) max — corpus-linear, no all-pairs, no corpus-wide state.
  // The bigram array is exploded with explode_outer from a zip_with of
  // two slices (the InferFiltersFromGenerate rule: a plain explode of a
  // computed array clones the whole expression into a size() pre-filter);
  // the two aggregates come from INDEPENDENT reads (ambiguous-self-join
  // rule).
  def q170RepetitionProfile(s: SparkSession, d: String): DataFrame = {
    def ws = split(col("text"), " ")
    val perdoc = Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      size(ws).as("wc"), size(array_distinct(ws)).as("dw"))
    val bigrams = zip_with(
      slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
      (a, b) => concat(a, lit(" "), b))
    val mx = Tables.documents(s, d)
      .select(col("doc_id"), explode_outer(bigrams).as("bg"))
      .filter(col("bg").isNotNull) // the wc<2 null row explode_outer adds
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("mc"))
    perdoc.join(mx, Seq("doc_id"), "left")
      .select(col("lang"), col("wc"), col("dw"),
        coalesce(col("mc"), lit(0L)).as("mc"))
      .select(col("lang"), col("wc"), col("dw"), col("mc"),
        expr("(wc - dw) * 1000000000L DIV wc").as("dup_e9"),
        when(col("wc") >= 2,
          expr("mc * 1000000000L DIV (wc - 1)")).otherwise(0L).as("top2_e9"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        count(when((col("wc") - col("dw")) * 25 > col("wc") * 17, 1))
          .as("n_flag_dup"),
        count(when(col("mc") * 25 > (col("wc") - 1) * 2 && col("wc") >= 2, 1))
          .as("n_flag_top2"),
        (sum(col("dup_e9")).cast("double") / count(lit(1)))
          .as("avg_dup_e9"),
        (sum(col("top2_e9")).cast("double") / count(lit(1)))
          .as("avg_top2_e9"))
      .orderBy("lang")
  }

  val q170Sql: String =
    """WITH w AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS ws,
      |         len(string_split(text, ' ')) AS wc
      |  FROM documents),
      |d AS (SELECT doc_id, lang, wc, len(list_distinct(ws)) AS dw FROM w),
      |bg AS (
      |  SELECT doc_id, bigram, COUNT(*) AS c FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, wc),
      |      i -> ws[i] || ' ' || ws[i+1])) AS bigram
      |    FROM w WHERE wc >= 2) GROUP BY 1, 2),
      |mx AS (SELECT doc_id, MAX(c) AS mc FROM bg GROUP BY 1),
      |p AS (
      |  SELECT d.lang, d.wc, d.dw, COALESCE(mx.mc, 0) AS mc,
      |    (d.wc - d.dw) * 1000000000 // d.wc AS dup_e9,
      |    CASE WHEN d.wc >= 2
      |      THEN COALESCE(mx.mc, 0) * 1000000000 // (d.wc - 1)
      |      ELSE 0 END AS top2_e9
      |  FROM d LEFT JOIN mx USING (doc_id))
      |SELECT lang, COUNT(*) AS n_docs,
      |  COUNT(CASE WHEN (wc - dw) * 25 > wc * 17 THEN 1 END) AS n_flag_dup,
      |  COUNT(CASE WHEN mc * 25 > (wc - 1) * 2 AND wc >= 2 THEN 1 END)
      |    AS n_flag_top2,
      |  CAST(SUM(dup_e9) AS DOUBLE) / COUNT(*) AS avg_dup_e9,
      |  CAST(SUM(top2_e9) AS DOUBLE) / COUNT(*) AS avg_top2_e9
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q170_repetition_profile" -> (q170RepetitionProfile _))

  val oracles: Map[String, String] = Map(
    "q170_repetition_profile" -> q170Sql)
}
