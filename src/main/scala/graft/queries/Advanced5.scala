package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 batch 5 (q130-q132): distribution-drift monitoring (PSI),
  * concentration measurement (Gini/Lorenz), and CUSUM change detection —
  * the production-monitoring family.
  */
object Advanced5 {

  // ---------------------------------------------------------------- q130
  // Population Stability Index between the first and second half of the
  // event stream (split at the median event_id): the drift metric every
  // deployed-model monitor computes per feature. PSI =
  // Σ (p_cur - p_ref)·ln(p_cur/p_ref) over value buckets; all
  // proportions come from exact counts (one aggregate per period + a
  // full-outer bucket align), the log sum follows q83's round(4) float
  // discipline. Laplace-style +1 smoothing keeps empty buckets finite —
  // identically on both engines.
  //
  // The split point is approx_percentile at accuracy 1e6 — a mergeable
  // bounded-memory GK sketch — because percentile_disc is an exact
  // BUFFERING aggregate (it collects every value into one task's
  // memory, the q130 scale-killer the round-5 verdict named). At gate
  // SFs the sketch's rank error bound εn = n/1e6 < 1 makes it
  // rank-EXACT, so the oracle keeps the exact quantile_disc definition;
  // Advanced5Spec pins the approx==exact agreement at every gate SF so
  // a drifting sketch shows up as a failing spec, not a silent hash
  // mismatch.
  def q130Psi(s: SparkSession, d: String): DataFrame = {
    val half = Tables.events(s, d)
      .select(expr("approx_percentile(event_id, 0.5, 1000000)")
        .as("mid"))
    val bucketed = Tables.events(s, d).crossJoin(broadcast(half))
      .select(col("event_type"),
        when(col("event_id") <= col("mid"), "ref").otherwise("cur").as("period"))
      .groupBy("event_type", "period").agg(count(lit(1)).as("n"))
    val byPeriod = bucketed.groupBy("event_type")
      .agg(sum(when(col("period") === "ref", col("n"))).as("n_ref"),
        sum(when(col("period") === "cur", col("n"))).as("n_cur"))
    val totals = byPeriod.select(
      sum(coalesce(col("n_ref"), lit(0L))).as("t_ref"),
      sum(coalesce(col("n_cur"), lit(0L))).as("t_cur"))
    byPeriod.crossJoin(broadcast(totals))
      .select(col("event_type"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"),
        (((coalesce(col("n_cur"), lit(0L)) + 1).cast("double") / (col("t_cur") + 1)) -
          ((coalesce(col("n_ref"), lit(0L)) + 1).cast("double") / (col("t_ref") + 1)))
          .multiply(log(((coalesce(col("n_cur"), lit(0L)) + 1).cast("double") / (col("t_cur") + 1)) /
            ((coalesce(col("n_ref"), lit(0L)) + 1).cast("double") / (col("t_ref") + 1))))
          .as("term"))
      .groupBy(lit("event_type_psi").as("feature"))
      .agg(count(lit(1)).as("n_buckets"), round(sum("term"), 4).as("psi"))
      .orderBy("feature")
  }

  val q130Sql: String =
    """WITH half AS (
      |  SELECT quantile_disc(event_id, 0.5) AS mid FROM events),
      |b AS (
      |  SELECT event_type,
      |    CASE WHEN event_id <= half.mid THEN 'ref' ELSE 'cur' END AS period,
      |    COUNT(*) AS n
      |  FROM events CROSS JOIN half GROUP BY 1, 2),
      |p AS (
      |  SELECT event_type,
      |    COALESCE(SUM(CASE WHEN period = 'ref' THEN n END), 0) AS n_ref,
      |    COALESCE(SUM(CASE WHEN period = 'cur' THEN n END), 0) AS n_cur
      |  FROM b GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
      |             CAST(SUM(n_cur) AS BIGINT) AS t_cur FROM p),
      |terms AS (
      |  SELECT p.event_type,
      |    (CAST(p.n_cur + 1 AS DOUBLE) / (t.t_cur + 1) -
      |     CAST(p.n_ref + 1 AS DOUBLE) / (t.t_ref + 1)) *
      |    LN((CAST(p.n_cur + 1 AS DOUBLE) / (t.t_cur + 1)) /
      |       (CAST(p.n_ref + 1 AS DOUBLE) / (t.t_ref + 1))) AS term
      |  FROM p CROSS JOIN t)
      |SELECT 'event_type_psi' AS feature, COUNT(*) AS n_buckets,
      |  ROUND(SUM(term), 4) AS psi
      |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q131
  // Gini coefficient / Lorenz audit of revenue concentration across
  // customers — the inequality measure behind "top-k% of accounts drive
  // x% of revenue". Per-customer totals first (one shuffle), then the
  // global rank comes from the PARTITIONED two-pass scan
  // (operators.Scan: range-partition on (rev, custkey) → local
  // row_number → broadcast per-partition offsets), so the entity table
  // never funnels through one task. The rank identity collapses the
  // per-row (nc, tot) window attaches into plain aggregates:
  // Σ((2r − n − 1)·rev) = 2·Σ(r·rev) − (n+1)·Σrev, all on exact
  // decimals, so the value is bit-identical to the window form the
  // oracle still states.
  def q131Gini(s: SparkSession, d: String): DataFrame = {
    val perCust = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
    graft.operators.Scan
      .withGlobalRowNumber(perCust, Seq(col("rev"), col("o_custkey")), "rnk")
      .select(lit("customer_revenue").as("dimension"), col("rnk"), col("rev"))
      .groupBy("dimension")
      .agg(count(lit(1)).as("nc"), sum(col("rev")).as("tot"),
        sum(col("rnk") * col("rev")).as("s1"))
      .select(col("dimension"), col("nc").as("n_customers"),
        round(col("tot").cast("double"), 2).as("total_revenue"),
        round((col("s1") * 2 - (col("nc") + 1) * col("tot")).cast("double") /
          (col("nc").cast("double") * col("tot").cast("double")), 6)
          .as("gini"))
      .orderBy("dimension")
  }

  val q131Sql: String =
    """WITH pc AS (
      |  SELECT o_custkey,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT o_custkey, rev,
      |    ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS rnk,
      |    COUNT(*) OVER () AS nc,
      |    SUM(rev) OVER () AS tot
      |  FROM pc)
      |SELECT 'customer_revenue' AS dimension,
      |  MAX(nc) AS n_customers,
      |  ROUND(CAST(MAX(tot) AS DOUBLE), 2) AS total_revenue,
      |  ROUND(CAST(SUM((rnk * 2 - nc - 1) * rev) AS DOUBLE)
      |    / (CAST(MAX(nc) AS DOUBLE) * CAST(MAX(tot) AS DOUBLE)), 6) AS gini
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q132
  // CUSUM change detection over the daily event-count series: cumulative
  // sum of deviations from the series mean, flagging the day where
  // |cusum| peaks — the classic level-shift detector. The series is the
  // PRE-AGGREGATED day grain (the windows order O(days) rows at any
  // fact size); deviations are exact decimals quantized at 6 so the
  // cumulative sums are bit-stable, and the argmax day is selected by
  // (rounded peak, earliest day) so ulps cannot flip it.
  def q132Cusum(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val nw = Window.partitionBy(lit(1))
    val cw = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily
      .withColumn("mean", sum(col("n")).over(nw).cast("double") /
        count(lit(1)).over(nw))
      .withColumn("dev", (col("n") - col("mean")).cast(DecimalType(18, 6)))
      .withColumn("cusum", sum(col("dev")).over(cw).cast("double"))
      .withColumn("abs_cusum", abs(col("cusum")))
    scored
      .select(lit("daily_events").as("series"), col("day"), col("n"),
        round(col("cusum"), 4).as("cusum"), col("abs_cusum"))
      .withColumn("peak", max(round(col("abs_cusum"), 4)).over(nw))
      .withColumn("is_changepoint", round(col("abs_cusum"), 4) === col("peak"))
      .select("series", "day", "n", "cusum", "is_changepoint")
      .orderBy("day")
  }

  val q132Sql: String =
    """WITH daily AS (
      |  SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1),
      |m AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot, COUNT(*) AS cnt FROM daily),
      |devs AS (
      |  SELECT day, n, CAST(n - m.tot / m.cnt AS DECIMAL(18,6)) AS dev
      |  FROM daily CROSS JOIN m),
      |scored AS (
      |  SELECT day, n,
      |    CAST(SUM(dev) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |      AS cusum
      |  FROM devs)
      |SELECT 'daily_events' AS series, day, n,
      |  ROUND(cusum, 4) AS cusum,
      |  ROUND(ABS(cusum), 4) = MAX(ROUND(ABS(cusum), 4)) OVER ()
      |    AS is_changepoint
      |FROM scored ORDER BY day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q130_psi"   -> (q130Psi _),
    "q131_gini"  -> (q131Gini _),
    "q132_cusum" -> (q132Cusum _))

  val oracles: Map[String, String] = Map(
    "q130_psi"   -> q130Sql,
    "q131_gini"  -> q131Sql,
    "q132_cusum" -> q132Sql)
}
