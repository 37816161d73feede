package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 batch 6 (q133-q134): supervised feature engineering (smoothed
  * target encoding) and experiment analysis (two-proportion z-test).
  */
object Advanced6 {

  // ---------------------------------------------------------------- q133
  // Smoothed target encoding (the category → E[target] feature with a
  // Bayesian prior toward the global mean, weight m=10 — the standard
  // leak-resistant categorical encoder): per-category decimal-exact
  // target sums, a 1-row global broadcast, closed-form double blend.
  // One aggregate over the joined fact + one broadcast — the encoder
  // table is category-cardinality-sized at any scale.
  def q133TargetEncoding(s: SparkSession, d: String): DataFrame = {
    val joined = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    val perSeg = joined.groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("t"))
    val global = perSeg.select(
      sum("n").as("gn"), sum(col("t").cast(DecimalType(28, 2))).cast("double").as("gt"))
    perSeg.crossJoin(broadcast(global))
      .select(col("c_mktsegment"), col("n"),
        round(col("t") / col("n"), 4).as("raw_mean"),
        round((col("t") + lit(10.0) * (col("gt") / col("gn"))) /
          (col("n") + 10), 4).as("encoded"))
      .orderBy("c_mktsegment")
  }

  val q133Sql: String =
    """WITH j AS (
      |  SELECT c.c_mktsegment, o.o_totalprice
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |seg AS (
      |  SELECT c_mktsegment, COUNT(*) AS n,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS t
      |  FROM j GROUP BY 1),
      |g AS (SELECT CAST(SUM(n) AS BIGINT) AS gn,
      |             CAST(SUM(CAST(t AS DECIMAL(28,2))) AS DOUBLE) AS gt
      |      FROM seg)
      |SELECT c_mktsegment, n, ROUND(t / n, 4) AS raw_mean,
      |  ROUND((t + 10.0 * (gt / gn)) / (n + 10), 4) AS encoded
      |FROM seg CROSS JOIN g ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q134
  // Two-proportion z-test (A/B experiment readout): cohorts split by
  // user-id parity, the metric is purchase share per cohort, the pooled
  // z statistic and a 95% verdict computed closed-form from exact
  // counts — sqrt is IEEE-exact, so the statistic is bit-identical
  // cross-engine. One aggregate pass over the fact table.
  def q134AbTest(s: SparkSession, d: String): DataFrame = {
    val agg = Tables.events(s, d)
      .select((col("user_id") % 2 === 0).as("is_a"),
        (col("event_type") === "purchase").as("conv"))
      .agg(
        count(when(col("is_a"), 1)).as("n_a"),
        count(when(col("is_a") && col("conv"), 1)).as("c_a"),
        count(when(!col("is_a"), 1)).as("n_b"),
        count(when(!col("is_a") && col("conv"), 1)).as("c_b"))
    agg.select(lit("purchase_rate_parity_split").as("experiment"),
        col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        round(col("c_a").cast("double") / col("n_a"), 6).as("p_a"),
        round(col("c_b").cast("double") / col("n_b"), 6).as("p_b"),
        round((col("c_a").cast("double") / col("n_a") -
          col("c_b").cast("double") / col("n_b")) /
          sqrt(((col("c_a") + col("c_b")).cast("double") / (col("n_a") + col("n_b"))) *
            (lit(1.0) - (col("c_a") + col("c_b")).cast("double") / (col("n_a") + col("n_b"))) *
            (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 4).as("z"))
      .withColumn("significant_95", abs(col("z")) > 1.96)
      .orderBy("experiment")
  }

  val q134Sql: String =
    """WITH a AS (
      |  SELECT
      |    COUNT(CASE WHEN user_id % 2 = 0 THEN 1 END) AS n_a,
      |    COUNT(CASE WHEN user_id % 2 = 0 AND event_type = 'purchase'
      |          THEN 1 END) AS c_a,
      |    COUNT(CASE WHEN user_id % 2 <> 0 THEN 1 END) AS n_b,
      |    COUNT(CASE WHEN user_id % 2 <> 0 AND event_type = 'purchase'
      |          THEN 1 END) AS c_b
      |  FROM events)
      |SELECT 'purchase_rate_parity_split' AS experiment,
      |  n_a, c_a, n_b, c_b,
      |  ROUND(CAST(c_a AS DOUBLE) / n_a, 6) AS p_a,
      |  ROUND(CAST(c_b AS DOUBLE) / n_b, 6) AS p_b,
      |  ROUND((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b) /
      |    sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
      |         (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
      |         (1.0 / n_a + 1.0 / n_b)), 4) AS z,
      |  ABS(ROUND((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b) /
      |    sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
      |         (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
      |         (1.0 / n_a + 1.0 / n_b)), 4)) > 1.96 AS significant_95
      |FROM a ORDER BY experiment""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q133_target_encoding" -> (q133TargetEncoding _),
    "q134_ab_test"         -> (q134AbTest _))

  val oracles: Map[String, String] = Map(
    "q133_target_encoding" -> q133Sql,
    "q134_ab_test"         -> q134Sql)
}
