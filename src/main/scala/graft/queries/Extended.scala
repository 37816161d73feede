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
      row_number().over(w).cast("long").as("rn"),
      dense_rank().over(w).cast("long").as("drnk"),
      round(percent_rank().over(w), 6).as("pct_rnk"),
      round(cume_dist().over(w), 6).as("cume"),
      ntile(4).over(w).cast("long").as("quartile"),
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
      levenshtein(col("p_brand"), col("p_type")).cast("long").as("brand_type_lev"),
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
      to_date(col("o_orderdate")).cast("timestamp").as("od"),
      date_add(to_date(col("o_orderdate")), 30).cast("timestamp").as("due_date"),
      add_months(to_date(col("o_orderdate")), 2).cast("timestamp").as("plus_2m"),
      last_day(to_date(col("o_orderdate"))).cast("timestamp").as("month_end"),
      ((dayofweek(col("o_orderdate")) + 5) % 7 + 1).cast("long").as("iso_dow"),
      dayofyear(col("o_orderdate")).cast("long").as("doy"),
      quarter(col("o_orderdate")).cast("long").as("qtr"),
      round(sqrt(col("o_totalprice")), 6).as("price_sqrt"),
      round(log(col("o_totalprice")), 6).as("price_ln"),
      round(pow(col("o_totalprice"), lit(0.25)), 6).as("price_4rt"),
      abs(col("o_totalprice") * -1).as("price_abs"),
      greatest(col("o_totalprice"), lit(100000.0)).as("price_floor100k"),
      pmod(col("o_orderkey"), lit(7)).as("key_mod7"))
    .orderBy("o_orderkey")

  val q46Sql: String =
    """SELECT o_orderkey,
      |  CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS od,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS TIMESTAMP) AS plus_2m,
      |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
      |  CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
      |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
      |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
      |  ROUND(SQRT(o_totalprice), 6) AS price_sqrt,
      |  ROUND(LN(o_totalprice), 6) AS price_ln,
      |  ROUND(POW(o_totalprice, 0.25), 6) AS price_4rt,
      |  ABS(o_totalprice * -1) AS price_abs,
      |  GREATEST(o_totalprice, 100000.0) AS price_floor100k,
      |  o_orderkey % 7 AS key_mod7
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q47
  // Array/lambda functions over embeddings — the codegen'd higher-order
  // function family (transform/filter/aggregate/sort/slice), which is the
  // UDF-free way to do per-row vector math. Double accumulation starts at
  // 0.0 and folds in element order on both engines → exact match.
  // (array results are surfaced as scalar element columns — engines agree
  // on float VALUES but array-typed outputs don't survive the driver's
  // hash compare)
  def q47ArrayOps(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("vec_dim"),
      element_at(col("embedding"), 1).as("e1"),
      element_at(col("embedding"), 2).as("e2"),
      round(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double")), 5).as("vec_sum"),
      size(filter(col("embedding"), x => x > 0.0f)).cast("long").as("n_pos"),
      array_max(col("embedding")).as("max_v"),
      element_at(sort_array(col("embedding")), 1).as("min_v"),
      element_at(sort_array(col("embedding")), 2).as("second_min_v"))
    .orderBy("vec_id")

  val q47Sql: String =
    """SELECT vec_id,
      |  len(embedding) AS vec_dim,
      |  embedding[1] AS e1,
      |  embedding[2] AS e2,
      |  ROUND(list_reduce(CAST(embedding AS DOUBLE[]), (a, b) -> a + b), 5) AS vec_sum,
      |  len(list_filter(embedding, x -> x > 0)) AS n_pos,
      |  list_aggregate(embedding, 'max') AS max_v,
      |  list_sort(embedding)[1] AS min_v,
      |  list_sort(embedding)[2] AS second_min_v
      |FROM embeddings ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q48
  // JSON scalar functions over events.props (the path-extraction
  // complement to q17's from_json + structural flatten). ONE from_json
  // projection — the naive 3× get_json_object spelling parses the JSON
  // three times per row, pure waste at 100 TB. CollapseProject keeps the
  // non-cheap JsonToStructs in its own Project (it never inlines an
  // expensive expression referenced more than once), so the plan parses
  // once; PlanShapeSpec pins that.
  def q48Json(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("missing", StringType)))
    Tables.events(s, d)
      .withColumn("p", from_json(col("props"), schema))
      .select(
        col("event_id"),
        col("p.k").as("k_str"),
        col("p.k").cast("int").as("k_int"),
        col("p.missing").as("absent"),
        col("props").rlike("\"k\"").as("has_k"))
      .orderBy("event_id")
  }

  val q48Sql: String =
    """SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
      |  json_extract_string(props, '$.missing') AS absent,
      |  regexp_matches(props, '"k"') AS has_k
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q49
  // Regex family: group extraction, match test, occurrence count.
  def q49Regex(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
      col("p_type").rlike("ST").as("is_standard_ish"),
      size(regexp_extract_all(col("p_name"), lit("[aeiou]"), lit(0))).cast("long").as("n_vowels"),
      regexp_replace(col("p_brand"), "[0-9]+", "#").as("brand_masked"))
    .orderBy("p_partkey")

  val q49Sql: String =
    """SELECT p_partkey,
      |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
      |  regexp_matches(p_type, 'ST') AS is_standard_ish,
      |  len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
      |  regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_masked
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q50
  // Null semantics: nullif/coalesce, null-safe equality (<=> / IS NOT
  // DISTINCT FROM), and count(col) vs count(*) null skipping.
  def q50Nulls(s: SparkSession, d: String): DataFrame = {
    val status_or_null = nullif(col("o_orderstatus"), lit("O"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        status_or_null.as("sn"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_all"),
        count(col("sn")).as("n_nonnull"),
        count(when(col("sn") <=> lit(null), true)).as("n_null_safe_eq_null"),
        coalesce(max(col("sn")), lit("none")).as("max_or_none"))
      .orderBy("o_orderpriority")
  }

  val q50Sql: String =
    """SELECT o_orderpriority,
      |  COUNT(*) AS n_all,
      |  COUNT(NULLIF(o_orderstatus, 'O')) AS n_nonnull,
      |  COUNT(CASE WHEN NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL
      |             THEN 1 END) AS n_null_safe_eq_null,
      |  COALESCE(MAX(NULLIF(o_orderstatus, 'O')), 'none') AS max_or_none
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_array_ops" -> (q47ArrayOps _),
    "q48_json" -> (q48Json _),
    "q49_regex" -> (q49Regex _),
    "q50_nulls" -> (q50Nulls _),
    "q42_pivot" -> (q42Pivot _),
    "q43_unpivot" -> (q43Unpivot _),
    "q44_window_family" -> (q44WindowFamily _),
    "q45_strings" -> (q45Strings _),
    "q46_dates_math" -> (q46DatesMath _))

  val oracles: Map[String, String] = Map(
    "q47_array_ops" -> q47Sql,
    "q48_json" -> q48Sql,
    "q49_regex" -> q49Sql,
    "q50_nulls" -> q50Sql,
    "q42_pivot" -> q42Sql,
    "q43_unpivot" -> q43Sql,
    "q44_window_family" -> q44Sql,
    "q45_strings" -> q45Sql,
    "q46_dates_math" -> q46Sql)
}
