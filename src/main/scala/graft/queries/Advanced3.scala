package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 batch 3 (q121-q125): exact-moment correlation/OLS, grouped
  * winsorization, small-file compaction maintenance, equi-width
  * histograms, and period-over-period time intelligence.
  */
object Advanced3 {

  // ---------------------------------------------------------------- q121
  // Pearson correlation + OLS regression from EXACT moments. Spark's
  // corr()/covar aggregates use streaming co-moment updates whose float
  // accumulation is partition-order-dependent — they cannot hash-match
  // another engine. The scale-correct alternative computed here: quantize
  // the factors to DECIMAL, take the five raw moments (Σx, Σy, Σxy, Σx²,
  // Σy²) as exact order-insensitive decimal sums in ONE aggregate pass,
  // then evaluate corr/slope/intercept as closed-form double arithmetic
  // on identical scalars. One map-side-combined aggregate at any scale.
  def q121Correlation(s: SparkSession, d: String): DataFrame = {
    val x = col("l_quantity").cast(DecimalType(18, 6))
    val y = col("l_discount").cast(DecimalType(18, 6))
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(x).cast("double").as("sx"),
        sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"),
        sum(x * x).cast("double").as("sxx"),
        sum(y * y).cast("double").as("syy"))
      .select(col("l_returnflag"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("corr"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round(col("sy") / col("n") -
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")) *
            (col("sx") / col("n")), 6).as("intercept"))
      .orderBy("l_returnflag")
  }

  val q121Sql: String =
    """WITH m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)) *
      |             CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)) *
      |             CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(18,6)) *
      |             CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS syy
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, n,
      |  ROUND((n * sxy - sx * sy) /
      |    sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr,
      |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
      |  ROUND(sy / n - (n * sxy - sx * sy) / (n * sxx - sx * sx)
      |    * (sx / n), 6) AS intercept
      |FROM m ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q122
  // Grouped winsorization: clip each group's values at its own exact
  // [p05, p95] (the robust-statistics outlier treatment a feature
  // pipeline applies before normalization). The bounds are DISCRETE
  // percentiles (ANSI percentile_disc == DuckDB quantile_disc): actual
  // data values, no interpolation arithmetic — so the <lo/>hi clip
  // comparisons cannot flip on a cross-engine interpolation ulp (the
  // interpolated `percentile` is safe to OUTPUT rounded, q18, but not
  // to COMPARE against). Bounds table is group-cardinality-sized →
  // broadcast back over the fact scan; the clipped re-aggregate
  // decimal-routes its sum. Two scans, no global sort.
  def q122Winsorize(s: SparkSession, d: String): DataFrame = {
    val b = Tables.orders(s, d).groupBy("o_orderpriority")
      .agg(expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY o_totalprice)").as("lo"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice)").as("hi"))
    Tables.orders(s, d)
      .join(broadcast(b), Seq("o_orderpriority"))
      .withColumn("clipped", least(greatest(col("o_totalprice"), col("lo")), col("hi")))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        count(when(col("o_totalprice") < col("lo") ||
          col("o_totalprice") > col("hi"), 1)).as("n_clipped"),
        sum(col("clipped").cast(DecimalType(18, 4))).cast("double").as("sum_clipped"),
        round(max("lo"), 4).as("p05"), round(max("hi"), 4).as("p95"))
      .orderBy("o_orderpriority")
  }

  val q122Sql: String =
    """WITH b AS (
      |  SELECT o_orderpriority,
      |    quantile_disc(o_totalprice, 0.05) AS lo,
      |    quantile_disc(o_totalprice, 0.95) AS hi
      |  FROM orders GROUP BY 1)
      |SELECT o.o_orderpriority, COUNT(*) AS n,
      |  COUNT(CASE WHEN o.o_totalprice < b.lo OR o.o_totalprice > b.hi
      |        THEN 1 END) AS n_clipped,
      |  CAST(SUM(CAST(LEAST(GREATEST(o.o_totalprice, b.lo), b.hi)
      |    AS DECIMAL(18,4))) AS DOUBLE) AS sum_clipped,
      |  ROUND(MAX(b.lo), 4) AS p05, ROUND(MAX(b.hi), 4) AS p95
      |FROM orders o JOIN b ON b.o_orderpriority = o.o_orderpriority
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q123
  // Small-file compaction — the table-maintenance operator every lake
  // needs on streaming/incremental ingest (thousands of tiny files turn
  // every scan into a file-listing + task-scheduling tax). A fragmented
  // copy (64 shards) is rewritten as 4 range-partitioned, key-sorted
  // files (repartitionByRange + sortWithinPartitions — the Z-order/
  // linear clustering write path), and the query proves BOTH properties
  // a compactor must guarantee: bounded file count and bit-exact content
  // conservation (the oracle aggregates the ORIGINAL table; the query
  // aggregates the compacted copy).
  // The work dir is keyed by applicationId: two concurrent drivers (e.g.
  // Bench while Verify runs) must not overwrite each other's files
  // mid-read. The per-group aggregate (a handful of rows) is collected
  // eagerly so the work dir can be deleted before returning — otherwise
  // every driver run leaks a full fragmented+compacted copy of events
  // under java.io.tmpdir.
  def q123Compaction(s: SparkSession, d: String): DataFrame = {
    val base = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_compaction_${s.sparkContext.applicationId}").getAbsolutePath
    val fragDir = s"$base/fragmented"
    val compDir = s"$base/compacted"
    Tables.events(s, d).repartition(64)
      .write.mode("overwrite").parquet(fragDir)
    s.read.parquet(fragDir)
      .repartitionByRange(4, col("user_id"), col("ts"))
      .sortWithinPartitions("user_id", "ts")
      .write.mode("overwrite").parquet(compDir)
    val nFiles = new java.io.File(compDir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    require(nFiles <= 4, s"compaction must bound file count, got $nFiles")
    val agg = s.read.parquet(compDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"),
        min("event_id").as("first_event"), max("event_id").as("last_event"))
      .orderBy("event_type")
    val rows = agg.collect() // one row per event_type — driver-side tiny
    deleteRecursively(new java.io.File(base))
    s.createDataFrame(java.util.Arrays.asList(rows: _*), agg.schema)
      .coalesce(1).sortWithinPartitions("event_type")
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  val q123Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
      |  MIN(event_id) AS first_event, MAX(event_id) AS last_event
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q124
  // Equi-width histogram with data-derived bounds: one 1-row min/max
  // aggregate (broadcast), then a narrow binning map + keyed count. The
  // bin index is pure double arithmetic on identical scalars; the max
  // value clamps into the last bin in both engines. The at-scale shape
  // of every distribution profile / drift monitor.
  def q124Histogram(s: SparkSession, d: String): DataFrame = {
    val nbins = 20
    val b = Tables.orders(s, d)
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
    Tables.orders(s, d).crossJoin(broadcast(b))
      .withColumn("bin",
        least(floor((col("o_totalprice") - col("lo")) /
          ((col("hi") - col("lo")) / nbins)), lit(nbins - 1L)))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        round(min("o_totalprice"), 2).as("bin_min"),
        round(max("o_totalprice"), 2).as("bin_max"))
      .orderBy("bin")
  }

  val q124Sql: String =
    """WITH b AS (
      |  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders)
      |SELECT LEAST(CAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 20))
      |    AS BIGINT), 19) AS bin,
      |  COUNT(*) AS n,
      |  ROUND(MIN(o_totalprice), 2) AS bin_min,
      |  ROUND(MAX(o_totalprice), 2) AS bin_max
      |FROM orders CROSS JOIN b
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q125
  // Period-over-period time intelligence: monthly revenue, month-over-
  // month delta and percent change, and a 3-month trailing average — the
  // BI reporting family (lag + bounded frame over a PRE-AGGREGATED
  // month-grain table, so the windows order |months| rows, never the
  // fact table). Decimal-routed month sums make every downstream delta
  // bit-identical.
  def q125PeriodOverPeriod(s: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy("month")
    val w3 = w.rowsBetween(-2, 0)
    Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
        .as("revenue"), count(lit(1)).as("n_orders"))
      .withColumn("prev", lag("revenue", 1).over(w))
      .select(col("month"), col("n_orders"), round(col("revenue"), 2).as("revenue"),
        round(col("revenue") - coalesce(col("prev"), col("revenue")), 2).as("mom_delta"),
        round((col("revenue") - coalesce(col("prev"), col("revenue"))) /
          coalesce(col("prev"), col("revenue")) * 100, 4).as("mom_pct"),
        round(avg("revenue").over(w3), 4).as("trailing_3mo"))
      .orderBy("month")
  }

  val q125Sql: String =
    """WITH m AS (
      |  SELECT date_trunc('month', o_orderdate) AS month,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |    COUNT(*) AS n_orders
      |  FROM orders GROUP BY 1)
      |SELECT month, n_orders, ROUND(revenue, 2) AS revenue,
      |  ROUND(revenue - COALESCE(LAG(revenue) OVER (ORDER BY month), revenue), 2)
      |    AS mom_delta,
      |  ROUND((revenue - COALESCE(LAG(revenue) OVER (ORDER BY month), revenue))
      |    / COALESCE(LAG(revenue) OVER (ORDER BY month), revenue) * 100, 4)
      |    AS mom_pct,
      |  ROUND(AVG(revenue) OVER (ORDER BY month
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS trailing_3mo
      |FROM m ORDER BY month""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q121_correlation" -> (q121Correlation _),
    "q122_winsorize"   -> (q122Winsorize _),
    "q123_compaction"  -> (q123Compaction _),
    "q124_histogram"   -> (q124Histogram _),
    "q125_period_over_period" -> (q125PeriodOverPeriod _))

  val oracles: Map[String, String] = Map(
    "q121_correlation" -> q121Sql,
    "q122_winsorize"   -> q122Sql,
    "q123_compaction"  -> q123Sql,
    "q124_histogram"   -> q124Sql,
    "q125_period_over_period" -> q125Sql)
}
