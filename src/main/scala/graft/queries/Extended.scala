package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Extended relational surface beyond the reference's own usage — the
  * rest of a complete library: pivot/unpivot reshaping, the full window
  * function family, and string/date/math scalar galleries. Every query
  * carries a DuckDB oracle; engine-divergent functions (initcap, dow
  * numbering) are either avoided or normalized on both sides.
  */
object Extended {

  // ---------------------------------------------------------------- q42
  // Pivot (explicit value list → deterministic output schema). Oracle is
  // portable conditional aggregation, which is also exactly how Catalyst
  // lowers pivot.
  def q42Pivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderpriority")

  val q42Sql: String =
    """SELECT o_orderpriority,
      |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
      |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
      |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q43
  // Unpivot/melt (Spark 3.4+ native) — long-form metrics table.
  def q43Unpivot(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal"),
        col("c_nationkey").cast("double").as("c_nation_d"))
      .unpivot(Array(col("c_custkey")),
        Array(col("c_acctbal"), col("c_nation_d")), "metric", "value")
      .orderBy("c_custkey", "metric")

  val q43Sql: String =
    """SELECT c_custkey, 'c_acctbal' AS metric, c_acctbal AS value FROM customer
      |UNION ALL
      |SELECT c_custkey, 'c_nation_d' AS metric, CAST(c_nationkey AS DOUBLE) FROM customer
      |ORDER BY c_custkey, metric""".stripMargin

  // ---------------------------------------------------------------- q44
  // The full window family over one deterministic ordering: row_number,
  // dense_rank, percent_rank, cume_dist, ntile, lag, lead, first/last in
  // frame, running sum.
  def q44WindowFamily(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.customer(s, d).select(
      col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
      row_number().over(w).as("rn"),
      dense_rank().over(w).as("drnk"),
      round(percent_rank().over(w), 6).as("pct_rnk"),
      round(cume_dist().over(w), 6).as("cume"),
      ntile(4).over(w).as("quartile"),
      lag("c_custkey", 1).over(w).as("prev_key"),
      lead("c_custkey", 1).over(w).as("next_key"),
      first("c_custkey").over(frame).as("first_key"),
      sum(col("c_acctbal").cast("decimal(18,2)")).over(frame)
        .cast("double").as("running_bal"))
    .orderBy("c_mktsegment", "rn")
  }

  val q44Sql: String =
    """SELECT c_custkey, c_mktsegment, c_acctbal,
      |  ROW_NUMBER() OVER w AS rn,
      |  DENSE_RANK() OVER w AS drnk,
      |  ROUND(PERCENT_RANK() OVER w, 6) AS pct_rnk,
      |  ROUND(CUME_DIST() OVER w, 6) AS cume,
      |  NTILE(4) OVER w AS quartile,
      |  LAG(c_custkey, 1) OVER w AS prev_key,
      |  LEAD(c_custkey, 1) OVER w AS next_key,
      |  FIRST_VALUE(c_custkey) OVER (PARTITION BY c_mktsegment
      |    ORDER BY c_acctbal, c_custkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (
      |    PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_bal
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, rn""".stripMargin

  // ---------------------------------------------------------------- q45
  // String function gallery (cross-engine-stable subset).
  def q45Strings(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      lpad(col("p_brand"), 12, "_").as("brand_lpad"),
      rpad(col("p_brand"), 12, ".").as("brand_rpad"),
      translate(col("p_type"), "aeiou", "AEIOU").as("type_translated"),
      substring(col("p_name"), 1, 5).as("name_left"),
      reverse(col("p_name")).as("name_rev"),
      repeat(col("p_brand"), 2).as("brand_twice"),
      levenshtein(col("p_brand"), col("p_type")).as("brand_type_lev"),
      split(col("p_type"), " ").getItem(0).as("type_first_word"),
      lower(col("p_name")).as("name_lower"),
      trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand_trim"))
    .orderBy("p_partkey")

  val q45Sql: String =
    """SELECT p_partkey,
      |  LPAD(p_brand, 12, '_') AS brand_lpad,
      |  RPAD(p_brand, 12, '.') AS brand_rpad,
      |  TRANSLATE(p_type, 'aeiou', 'AEIOU') AS type_translated,
      |  SUBSTRING(p_name, 1, 5) AS name_left,
      |  REVERSE(p_name) AS name_rev,
      |  REPEAT(p_brand, 2) AS brand_twice,
      |  LEVENSHTEIN(p_brand, p_type) AS brand_type_lev,
      |  SPLIT_PART(p_type, ' ', 1) AS type_first_word,
      |  LOWER(p_name) AS name_lower,
      |  TRIM('  ' || p_brand || '  ') AS brand_trim
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q46
  // Date + math gallery. Day-of-week normalized to ISO (Mon=1) on both
  // sides: Spark dayofweek is 1=Sunday, DuckDB isodow is 1=Monday.
  def q46DatesMath(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      to_date(col("o_orderdate")).as("od"),
      date_add(to_date(col("o_orderdate")), 30).as("due_date"),
      add_months(to_date(col("o_orderdate")), 2).as("plus_2m"),
      last_day(to_date(col("o_orderdate"))).as("month_end"),
      (dayofweek(col("o_orderdate")) + 5) % 7 + 1 as "iso_dow",
      dayofyear(col("o_orderdate")).as("doy"),
      quarter(col("o_orderdate")).as("qtr"),
      round(sqrt(col("o_totalprice")), 6).as("price_sqrt"),
      round(log(col("o_totalprice")), 6).as("price_ln"),
      round(pow(col("o_totalprice"), lit(0.25)), 6).as("price_4rt"),
      abs(col("o_totalprice") * -1).as("price_abs"),
      greatest(col("o_totalprice"), lit(100000.0)).as("price_floor100k"),
      pmod(col("o_orderkey"), lit(7)).as("key_mod7"))
    .orderBy("o_orderkey")

  val q46Sql: String =
    """SELECT o_orderkey,
      |  CAST(o_orderdate AS DATE) AS od,
      |  CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2m,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  isodow(o_orderdate) AS iso_dow,
      |  dayofyear(o_orderdate) AS doy,
      |  quarter(o_orderdate) AS qtr,
      |  ROUND(SQRT(o_totalprice), 6) AS price_sqrt,
      |  ROUND(LN(o_totalprice), 6) AS price_ln,
      |  ROUND(POW(o_totalprice, 0.25), 6) AS price_4rt,
      |  ABS(o_totalprice * -1) AS price_abs,
      |  GREATEST(o_totalprice, 100000.0) AS price_floor100k,
      |  o_orderkey % 7 AS key_mod7
      |FROM orders ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_pivot" -> (q42Pivot _),
    "q43_unpivot" -> (q43Unpivot _),
    "q44_window_family" -> (q44WindowFamily _),
    "q45_strings" -> (q45Strings _),
    "q46_dates_math" -> (q46DatesMath _))

  val oracles: Map[String, String] = Map(
    "q42_pivot" -> q42Sql,
    "q43_unpivot" -> q43Sql,
    "q44_window_family" -> q44Sql,
    "q45_strings" -> q45Sql,
    "q46_dates_math" -> q46Sql)
}
