package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Second extension batch — the aggregation/join/set-operation families a
  * complete engine needs that neither the reference (SURVEY §2.3/§2.4:
  * inner equi-joins and plain GROUP BY only) nor the first extension
  * round covered. Every query is DuckDB-oracled.
  *
  * Scale notes follow the house rules: hash aggregates with map-side
  * partials, no driver-side collects, decimal-routed money sums,
  * deterministic total ORDER BY on every output.
  */
object Complete {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")
  private def dsumSql(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(18,2))) AS DOUBLE)"

  // ---------------------------------------------------------------- q40
  // CUBE grouping sets (all 2^k subtotal combinations) — completes the
  // grouping-set family started by q39's ROLLUP. NULLS FIRST pinned on
  // both sides (Spark ASC default vs DuckDB NULLS LAST).
  def q40Cube(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val q40Sql: String =
    s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       |  ${dsumSql("l_quantity")} AS sum_qty
       |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q52
  // Full outer join — both dangling sides exercised: only high-balance
  // customers survive the left side, only big-ticket orders the right, so
  // rows exist with a missing customer AND with a missing order aggregate.
  def q52FullOuter(s: SparkSession, d: String): DataFrame = {
    val rich = Tables.customer(s, d).filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey"), col("c_acctbal"))
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 250000.0)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_big"), dsum(col("o_totalprice")).as("big_total"))
    rich.join(big, rich("c_custkey") === big("o_custkey"), "full_outer")
      .select(
        coalesce(rich("c_custkey"), big("o_custkey")).as("custkey"),
        rich("c_acctbal").isNotNull.as("is_rich"),
        coalesce(col("n_big"), lit(0L)).as("n_big"),
        coalesce(col("big_total"), lit(0.0)).as("big_total"))
      .orderBy("custkey")
  }

  val q52Sql: String =
    s"""WITH rich AS (
       |  SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000.0),
       |big AS (
       |  SELECT o_custkey, COUNT(*) AS n_big,
       |    ${dsumSql("o_totalprice")} AS big_total
       |  FROM orders WHERE o_totalprice > 250000.0 GROUP BY 1)
       |SELECT COALESCE(rich.c_custkey, big.o_custkey) AS custkey,
       |  rich.c_acctbal IS NOT NULL AS is_rich,
       |  COALESCE(big.n_big, 0) AS n_big,
       |  COALESCE(big.big_total, 0.0) AS big_total
       |FROM rich FULL OUTER JOIN big ON rich.c_custkey = big.o_custkey
       |ORDER BY custkey""".stripMargin

  // ---------------------------------------------------------------- q53
  // DISTINCT aggregates — Catalyst plans multi-distinct via Expand (one
  // row replica per distinct column), the distributed-correct strategy.
  // SUM(DISTINCT) decimal-routed like every money sum.
  def q53DistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        sum_distinct(col("l_quantity").cast(DecimalType(18, 2)))
          .cast("double").as("sum_distinct_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  val q53Sql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_suppkey) AS n_supp,
      |  COUNT(DISTINCT l_partkey) AS n_part,
      |  CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_distinct_qty,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q54
  // Statistical aggregates: stddev/corr/covar. Rounding absorbs the
  // last-ulp divergence of parallel single-pass moment accumulation
  // (values are 1e5-scale → round(2) leaves 7 safe digits; corr is a
  // scale-free ratio → round(6)).
  def q54Stats(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        round(stddev_samp(col("o_totalprice")), 2).as("sd_price"),
        round(stddev_pop(col("o_totalprice")), 2).as("sd_pop_price"),
        round(corr(col("o_totalprice"), col("o_orderkey").cast("double")), 6)
          .as("price_key_corr"),
        round(covar_samp(col("o_totalprice"), col("o_orderkey").cast("double")), 2)
          .as("price_key_covar"))
      .orderBy("o_orderpriority")

  val q54Sql: String =
    """SELECT o_orderpriority,
      |  ROUND(stddev_samp(o_totalprice), 2) AS sd_price,
      |  ROUND(stddev_pop(o_totalprice), 2) AS sd_pop_price,
      |  ROUND(corr(o_totalprice, CAST(o_orderkey AS DOUBLE)), 6) AS price_key_corr,
      |  ROUND(covar_samp(o_totalprice, CAST(o_orderkey AS DOUBLE)), 2) AS price_key_covar
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q55
  // max_by/min_by (argmax/argmin) — ordering key is the UNIQUE c_custkey:
  // neither engine defines tie-breaks for these aggregates, so a
  // deterministic query must order by a key (composite struct ordering
  // isn't portable — DuckDB arg_max takes scalar keys only).
  def q55ArgMinMax(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy("c_mktsegment")
      .agg(
        max_by(col("c_name"), col("c_custkey")).as("latest_name"),
        min_by(col("c_name"), col("c_custkey")).as("earliest_name"),
        max_by(col("c_acctbal"), col("c_custkey")).as("latest_bal"),
        count(lit(1)).as("n"))
      .orderBy("c_mktsegment")

  val q55Sql: String =
    """SELECT c_mktsegment,
      |  arg_max(c_name, c_custkey) AS latest_name,
      |  arg_min(c_name, c_custkey) AS earliest_name,
      |  arg_max(c_acctbal, c_custkey) AS latest_bal,
      |  COUNT(*) AS n
      |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q56
  // Ordered string aggregation (listagg). collect_set order is
  // nondeterministic → array_sort before joining; DuckDB side pins the
  // same order with ORDER BY inside string_agg.
  def q56StringAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"),
        array_join(array_sort(collect_set(year(col("o_orderdate")).cast("string"))), ",")
          .as("years"))
      .orderBy("o_orderpriority")

  val q56Sql: String =
    """SELECT o_orderpriority,
      |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
      |  string_agg(DISTINCT CAST(YEAR(o_orderdate) AS VARCHAR), ','
      |             ORDER BY CAST(YEAR(o_orderdate) AS VARCHAR)) AS years
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q57
  // Set operations: INTERSECT / EXCEPT (distinct semantics) — absent from
  // the reference (SURVEY §2.7) but part of any complete SQL surface.
  // Physical shape: both are hash aggregates over a union-like exchange,
  // no row explosion.
  def q57SetOps(s: SparkSession, d: String): DataFrame = {
    val custNations = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
    val suppNations = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
    val both = custNations.intersect(suppNations)
      .withColumn("op", lit("cust_and_supp"))
    val custOnly = custNations.except(suppNations)
      .withColumn("op", lit("cust_only"))
    val suppOnly = suppNations.except(custNations)
      .withColumn("op", lit("supp_only"))
    both.unionByName(custOnly).unionByName(suppOnly)
      .orderBy("op", "nationkey")
  }

  val q57Sql: String =
    """SELECT nationkey, 'cust_and_supp' AS op FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  INTERSECT SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT nationkey, 'cust_only' AS op FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  EXCEPT SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT nationkey, 'supp_only' AS op FROM (
      |  SELECT s_nationkey AS nationkey FROM supplier
      |  EXCEPT SELECT c_nationkey FROM customer)
      |ORDER BY op, nationkey""".stripMargin

  // ---------------------------------------------------------------- q58
  // Subquery family: correlated scalar subquery + IN + correlated EXISTS.
  // ONE SQL text parsed by BOTH engines (ANSI intersection) — Catalyst
  // decorrelates to joins (RewriteCorrelatedScalarSubquery), DuckDB to its
  // own delim joins; semantics must agree exactly. The threshold average is
  // decimal-routed (exact SUM, then one deterministic double division) so a
  // row landing within ulps of avg*1.8 cannot flip between engines.
  val q58Sql: String =
    """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
      |FROM orders o
      |WHERE o.o_totalprice > (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |                               / COUNT(*) FROM orders o2
      |                        WHERE o2.o_orderpriority = o.o_orderpriority) * 1.8
      |  AND o.o_custkey IN (SELECT c_custkey FROM customer
      |                      WHERE c_mktsegment = 'BUILDING')
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 30)
      |ORDER BY o.o_orderkey""".stripMargin

  def q58Subqueries(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(q58Sql)
  }

  // ---------------------------------------------------------------- q59
  // PII-style redaction over the events payload — the masking pass every
  // training-data pipeline runs before publication. Pure regexp_replace
  // (codegen'd, narrow, zero shuffle) + leak accounting.
  def q59Redact(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      regexp_replace(col("props"), "[0-9]+", "#").as("props_masked"),
      size(regexp_extract_all(col("props"), lit("[0-9]+"), lit(0)))
        .cast("long").as("n_digit_runs"),
      regexp_replace(col("props"),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<email>").as("props_email_safe"))
    .orderBy("event_id")

  val q59Sql: String =
    """SELECT event_id,
      |  regexp_replace(props, '[0-9]+', '#', 'g') AS props_masked,
      |  len(regexp_extract_all(props, '[0-9]+')) AS n_digit_runs,
      |  regexp_replace(props, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<email>', 'g')
      |    AS props_email_safe
      |FROM events ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q60
  // Repetition-based quality signals (the Gopher-style dedup-within-doc
  // filters): token count, distinct ratio, max single-token share. Both
  // engines tokenize with the same \S+ regex so empty docs agree (split
  // would give [""] in Spark but [] in DuckDB).
  def q60Repetition(s: SparkSession, d: String): DataFrame = {
    val toks = regexp_extract_all(col("text"), lit("\\S+"), lit(0))
    // max token multiplicity via sort + run-length fold: O(n log n) per
    // doc (a per-token filter() would be O(n²) — measured 2.8s vs 0.4s at
    // sf0.1 on this corpus)
    val maxRun = expr(
      """aggregate(
        |  array_sort(toks),
        |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
        |  (st, x) -> named_struct(
        |    'prev', x,
        |    'run',  IF(x <=> st.prev, st.run + 1L, 1L),
        |    'best', GREATEST(st.best, IF(x <=> st.prev, st.run + 1L, 1L))),
        |  st -> st.best)""".stripMargin)
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        maxRun.as("max_tok_count"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        when(col("n_tokens") === 0, lit(1.0))
          .otherwise(round(col("n_distinct").cast("double") / col("n_tokens"), 6))
          .as("distinct_ratio"),
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("max_tok_count").cast("double") / col("n_tokens"), 6))
          .as("top_token_share"))
      .orderBy("doc_id")
  }

  val q60Sql: String =
    """WITH t AS (
      |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks FROM documents),
      |stats AS (
      |  SELECT doc_id, len(toks) AS n_tokens,
      |    len(list_distinct(toks)) AS n_distinct,
      |    list_max(list_transform(list_distinct(toks),
      |      tk -> len(list_filter(toks, x -> x = tk)))) AS max_tok_count
      |  FROM t)
      |SELECT doc_id, n_tokens, n_distinct,
      |  CASE WHEN n_tokens = 0 THEN 1.0
      |       ELSE ROUND(CAST(n_distinct AS DOUBLE) / n_tokens, 6) END
      |    AS distinct_ratio,
      |  CASE WHEN n_tokens = 0 THEN 0.0
      |       ELSE ROUND(CAST(max_tok_count AS DOUBLE) / n_tokens, 6) END
      |    AS top_token_share
      |FROM stats ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q61
  // MERGE/upsert (graft.operators.Upsert.mergeByKey): updates bump the
  // price of every 97th order, inserts add new negative-key orders, and
  // the merged table is aggregated. The oracle spells out MERGE's
  // anti-join + union semantics in ANSI SQL.
  def q61Merge(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
    val updates = Tables.orders(s, d)
      .filter(col("o_orderkey") % 97 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1111.0)
    val inserts = Tables.orders(s, d)
      .filter(col("o_orderkey") % 101 === 0)
      .withColumn("o_orderkey", -col("o_orderkey") - 1L)
    val merged = graft.operators.Upsert.mergeByKey(
      base, updates.unionByName(inserts), Seq("o_orderkey"))
    merged.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
        min("o_orderkey").as("min_key"))
      .orderBy("o_orderpriority")
  }

  val q61Sql: String =
    s"""WITH upd AS (
       |  SELECT o_orderkey, o_custkey, o_orderstatus,
       |    o_totalprice + 1111.0 AS o_totalprice, o_orderdate, o_orderpriority
       |  FROM orders WHERE o_orderkey % 97 = 0
       |  UNION ALL
       |  SELECT -o_orderkey - 1, o_custkey, o_orderstatus, o_totalprice,
       |    o_orderdate, o_orderpriority
       |  FROM orders WHERE o_orderkey % 101 = 0),
       |merged AS (
       |  SELECT * FROM orders
       |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
       |  UNION ALL SELECT * FROM upd)
       |SELECT o_orderpriority, COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total,
       |  MIN(o_orderkey) AS min_key
       |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q63
  // RANGE window frame (value-based, not row-based): for each customer,
  // peers in the same segment within ±100.0 of their balance. Completes
  // q44's ROWS-frame family.
  def q63RangeFrame(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"))
      .rangeBetween(-100L, 100L)
    Tables.customer(s, d).select(
      col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
      count(lit(1)).over(w).as("n_near"),
      sum(col("c_acctbal").cast(DecimalType(18, 2))).over(w)
        .cast("double").as("near_total"))
      .orderBy("c_custkey")
  }

  val q63Sql: String =
    s"""SELECT c_custkey, c_mktsegment, c_acctbal,
       |  COUNT(*) OVER w AS n_near,
       |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER w AS DOUBLE) AS near_total
       |FROM customer
       |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal
       |             RANGE BETWEEN 100.0 PRECEDING AND 100.0 FOLLOWING)
       |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q64
  // posexplode (ordinal-preserving array unnest — the Generate shape with
  // position, which plain explode loses). Ordinals matter whenever array
  // order is data (embedding dims, chunk sequence numbers).
  def q64Posexplode(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .filter(col("pos") < 3)
      .select(col("vec_id"), col("pos").cast("long").as("pos"), col("val"))
      .orderBy("vec_id", "pos")

  val q64Sql: String =
    """SELECT vec_id, CAST(u.pos AS BIGINT) AS pos, u.val
      |FROM (SELECT vec_id,
      |        unnest(list_transform(embedding, (v, i) -> {'pos': i - 1, 'val': v})) AS u
      |      FROM embeddings)
      |WHERE u.pos < 3 ORDER BY vec_id, pos""".stripMargin

  // ---------------------------------------------------------------- q67
  // MapType + higher-order map functions (map_from_arrays, element_at,
  // transform_values, map_filter) and to_json — the remaining type-system
  // surface (silver/gold schemas are flat, but a complete library carries
  // maps and JSON rendering). The oracle restates the map arithmetic
  // directly — DuckDB MAPs exist but the VALUES are what must agree.
  def q67MapOps(s: SparkSession, d: String): DataFrame = {
    val m = map_from_arrays(
      array(lit("price"), lit("key")),
      array(col("o_totalprice"), col("o_orderkey").cast("double")))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), m.as("m"))
      .select(col("o_orderkey"), col("o_custkey"),
        element_at(col("m"), "price").as("price"),
        size(col("m")).cast("long").as("m_size"),
        element_at(transform_values(col("m"), (_, v) => v * 2), "key").as("key_x2"),
        size(map_filter(col("m"), (_, v) => v > 100000.0)).cast("long").as("n_big"),
        to_json(struct(col("o_orderkey"), col("o_custkey"))).as("js"))
      .orderBy("o_orderkey")
  }

  val q67Sql: String =
    """SELECT o_orderkey, o_custkey,
      |  o_totalprice AS price,
      |  CAST(2 AS BIGINT) AS m_size,
      |  CAST(o_orderkey AS DOUBLE) * 2 AS key_x2,
      |  CAST(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END +
      |       CASE WHEN CAST(o_orderkey AS DOUBLE) > 100000.0 THEN 1 ELSE 0 END
      |       AS BIGINT) AS n_big,
      |  '{"o_orderkey":' || o_orderkey || ',"o_custkey":' || o_custkey || '}'
      |    AS js
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q68
  // CSV sink + source round-trip with explicit schema: doubles survive
  // exactly (shortest-representation formatting reparses to the same
  // bits), so the post-roundtrip aggregate must hash-match the direct
  // aggregate the oracle computes.
  def q68CsvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_csv_roundtrip").getAbsolutePath
    val cust = Tables.customer(s, d).filter(col("c_nationkey") < 5)
    cust.write.mode("overwrite").option("header", "true").csv(dir)
    s.read.schema(cust.schema).option("header", "true").csv(dir)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("total_bal"),
        min("c_name").as("first_name"))
      .orderBy("c_nationkey")
  }

  val q68Sql: String =
    s"""SELECT c_nationkey, COUNT(*) AS n, ${dsumSql("c_acctbal")} AS total_bal,
       |  MIN(c_name) AS first_name
       |FROM customer WHERE c_nationkey < 5
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q69
  // Hive-partitioned write + partition-pruned read: the filter on the
  // partition column prunes at FILE LISTING time (PartitionFilters in
  // the scan, no data files of other partitions opened) — the layout
  // lever that replaces the reference's newest-folder convention.
  def q69PartitionPruned(s: SparkSession, d: String): DataFrame = {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_part_orders").getAbsolutePath
    Tables.orders(s, d).write.mode("overwrite")
      .partitionBy("o_orderpriority").parquet(dir)
    s.read.parquet(dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy("o_year")
  }

  val q69Sql: String =
    s"""SELECT YEAR(o_orderdate) AS o_year, COUNT(*) AS n,
       |  ${dsumSql("o_totalprice")} AS total
       |FROM orders WHERE o_orderpriority = '1-URGENT'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q70
  // ORC + JSON sink/source round-trips (the remaining built-in columnar
  // and text formats; spark-avro is an external package and out of
  // scope). Doubles survive both: ORC stores binary doubles, JSON writes
  // shortest-representation text that reparses to the same bits — so
  // per-format aggregates must agree with each other AND the oracle.
  def q70FormatRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_formats").getAbsolutePath
    val sup = Tables.supplier(s, d)
    sup.write.mode("overwrite").orc(s"$dir/orc")
    sup.write.mode("overwrite").json(s"$dir/json")
    val fromOrc = s.read.orc(s"$dir/orc")
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_orc"), dsum(col("s_acctbal")).as("bal_orc"))
    val fromJson = s.read.schema(sup.schema).json(s"$dir/json")
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_json"), dsum(col("s_acctbal")).as("bal_json"))
    fromOrc.join(fromJson, Seq("s_nationkey")).orderBy("s_nationkey")
  }

  val q70Sql: String =
    s"""SELECT s_nationkey, COUNT(*) AS n_orc, ${dsumSql("s_acctbal")} AS bal_orc,
       |  COUNT(*) AS n_json, ${dsumSql("s_acctbal")} AS bal_json
       |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q72
  // Salted skew join (the manual hot-key split for cases AQE can't
  // reach): lineitem salted on (orderkey, linenumber-derived salt),
  // orders replicated 8×. Row-identical to the plain join — which is
  // exactly what the oracle states.
  def q72SaltedJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val o = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.operators.SkewJoin.saltedJoin(li, o, Seq("l_orderkey"),
        factor = 8, saltSource = col("l_linenumber"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("qty"))
      .orderBy("o_orderpriority")
  }

  val q72Sql: String =
    s"""SELECT o_orderpriority, COUNT(*) AS n_lines,
       |  ${dsumSql("l_quantity")} AS qty
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q73
  // duration_ms custom expression (the F1 lap-time fix for SURVEY quirk
  // Q4: lexicographic comparison of "m:ss.SSS" strings is wrong across
  // minute-digit boundaries). The testdata has no duration column, so
  // the query CONSTRUCTS one arithmetically, parses it back through the
  // codegen'd expression, and the oracle states the identity directly —
  // an exact end-to-end check of the parser.
  def q73DurationParse(s: SparkSession, d: String): DataFrame = {
    graft.Engine.registerFunctions(s)
    val m = col("o_orderkey") % 60
    val sec = col("o_custkey") % 60
    val ms = col("o_orderkey") % 1000
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        format_string("%d:%02d.%03d", m, sec, ms).as("lap"))
      .withColumn("lap_ms", expr("duration_ms(lap)"))
      .orderBy("o_orderkey")
  }

  val q73Sql: String =
    """SELECT o_orderkey,
      |  (o_orderkey % 60) || ':' ||
      |    lpad(CAST(o_custkey % 60 AS VARCHAR), 2, '0') || '.' ||
      |    lpad(CAST(o_orderkey % 1000 AS VARCHAR), 3, '0') AS lap,
      |  (o_orderkey % 60) * 60000 + (o_custkey % 60) * 1000 +
      |    (o_orderkey % 1000) AS lap_ms
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q76
  // LATERAL correlated subquery with ORDER BY + LIMIT (top-n per outer
  // row) — ONE SQL text parsed by both engines. Catalyst decorrelates
  // the lateral into a ranked join; semantically q08's rank-filter, but
  // exercising the SQL-surface path a migrating user would write.
  val q76Sql: String =
    """SELECT n_name, c.c_name, c.c_acctbal
      |FROM nation, LATERAL (SELECT c_name, c_acctbal, c_custkey FROM customer
      |                      WHERE c_nationkey = n_nationkey
      |                      ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
      |ORDER BY n_name, c.c_acctbal DESC, c.c_name""".stripMargin

  def q76Lateral(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(q76Sql)
  }

  // ---------------------------------------------------------------- q78
  // Bucketed co-located join: both sides written bucketed on the join
  // key (sorted within buckets), so the join plans with ZERO exchanges —
  // the layout lever that amortizes one shuffle across every future join
  // on that key. The oracle is the plain join; PlanShapeSpec asserts the
  // exchange-free plan.
  def q78BucketedJoin(s: SparkSession, d: String): DataFrame = {
    s.sql("CREATE DATABASE IF NOT EXISTS graft_bucketed")
    s.sql("DROP TABLE IF EXISTS graft_bucketed.li")
    s.sql("DROP TABLE IF EXISTS graft_bucketed.o")
    // an in-memory catalog forgets tables across sessions but their
    // warehouse directories survive — clear stale locations physically
    // or the CTAS refuses with LOCATION_ALREADY_EXISTS
    val wh = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), "graft_bucketed.db")
    val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(wh, "li"), true)
    fs.delete(new org.apache.hadoop.fs.Path(wh, "o"), true)
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_quantity")
    val o = Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_bucketed.li")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_bucketed.o")
    s.table("graft_bucketed.li")
      .join(s.table("graft_bucketed.o"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("qty"))
      .orderBy("o_orderpriority")
  }

  val q78Sql: String = q72Sql // same semantics as the salted variant

  // ---------------------------------------------------------------- q79
  // Forward fill (per-key carry-forward of a sparse column): the
  // time-series gap-filling primitive — last(x, ignoreNulls) over an
  // unbounded-preceding frame, the same carry-forward shape the as-of
  // join generalizes. Event ties pinned by event_id on both engines.
  def q79ForwardFill(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(unix_micros(col("ts")), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d).select(
      col("event_id"), col("user_id"),
      last(when(col("event_type") === "purchase", col("value")),
        ignoreNulls = true).over(w).as("last_purchase_value"),
      last(when(col("event_type") === "view", col("event_id")),
        ignoreNulls = true).over(w).as("last_view_event"))
      .orderBy("event_id")
  }

  val q79Sql: String =
    """SELECT event_id, user_id,
      |  LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
      |    OVER w AS last_purchase_value,
      |  LAST_VALUE(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
      |    OVER w AS last_view_event
      |FROM events
      |WINDOW w AS (PARTITION BY user_id
      |             ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
      |             ROWS UNBOUNDED PRECEDING)
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- q80
  // Parquet schema evolution: a v2 batch lands with an extra column, the
  // merged read surfaces typed nulls for v1 files — the additive-column
  // upgrade every long-lived lake table goes through (the reference's
  // overwrite-only lake sidesteps it; a real one can't).
  def q80SchemaEvolution(s: SparkSession, d: String): DataFrame = {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_schema_evo").getAbsolutePath
    val v1 = Tables.supplier(s, d).filter(col("s_suppkey") % 2 === 0)
      .select("s_suppkey", "s_name", "s_nationkey")
    val v2 = Tables.supplier(s, d).filter(col("s_suppkey") % 2 === 1)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("s_acctbal")) // the evolved column
    v1.write.mode("overwrite").parquet(s"$dir/batch=1")
    v2.write.mode("overwrite").parquet(s"$dir/batch=2")
    s.read.option("mergeSchema", "true").parquet(dir)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n"),
        count(col("s_acctbal")).as("n_with_bal"),
        dsum(coalesce(col("s_acctbal"), lit(0.0))).as("bal_sum"))
      .orderBy("s_nationkey")
  }

  val q80Sql: String =
    s"""SELECT s_nationkey, COUNT(*) AS n,
       |  COUNT(CASE WHEN s_suppkey % 2 = 1 THEN 1 END) AS n_with_bal,
       |  ${dsumSql("CASE WHEN s_suppkey % 2 = 1 THEN s_acctbal ELSE 0.0 END")}
       |    AS bal_sum
       |FROM supplier GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q81
  // Explicit GROUPING SETS + GROUPING() indicators — the general form
  // behind q39's ROLLUP and q40's CUBE (and the only way to get, e.g.,
  // per-status and per-priority subtotals WITHOUT their cross product).
  def q81GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(q81Sql)
  }

  val q81Sql: String =
    s"""SELECT o_orderstatus, o_orderpriority,
       |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
       |  COUNT(*) AS n, ${dsumSql("o_totalprice")} AS total
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q82
  // Sliding event-time windows (batch twin of window(ts, '2 days',
  // '1 day')): every event lands in exactly width/slide windows. The
  // oracle unnests each event's two window starts explicitly — same
  // replication Spark's TimeWindow expression generates.
  def q82SlidingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 days", "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n_events"))
      .orderBy("w_start", "event_type")

  val q82Sql: String =
    """SELECT w_start, event_type, COUNT(*) AS n_events FROM (
      |  SELECT unnest([CAST(CAST(ts AS DATE) AS TIMESTAMP) - INTERVAL 1 DAY,
      |                 CAST(CAST(ts AS DATE) AS TIMESTAMP)]) AS w_start,
      |         event_type
      |  FROM events)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q89
  // Right outer join — completes the join-type matrix (inner/left/full/
  // semi/anti/cross covered elsewhere): every customer kept, order
  // aggregate attached where present.
  def q89RightOuter(s: SparkSession, d: String): DataFrame = {
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 300000.0)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_big"))
    big.join(Tables.customer(s, d), big("o_custkey") === col("c_custkey"),
        "right_outer")
      .select(col("c_custkey"), col("c_mktsegment"),
        coalesce(col("n_big"), lit(0L)).as("n_big"))
      .orderBy("c_custkey")
  }

  val q89Sql: String =
    """SELECT c_custkey, c_mktsegment, COALESCE(big.n_big, 0) AS n_big
      |FROM (SELECT o_custkey, COUNT(*) AS n_big FROM orders
      |      WHERE o_totalprice > 300000.0 GROUP BY 1) big
      |RIGHT JOIN customer ON big.o_custkey = c_custkey
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q84
  // Ordered-event funnel: signup → first view after signup → first
  // purchase after that view, per user; stage counts = the conversion
  // funnel. Everything is min-aggregation over conditional timestamps —
  // one shuffle per stage table, no window state.
  def q84Funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("t").as("t_signup"))
    val view = ev.filter(col("event_type") === "view")
      .join(signup, "user_id")
      .filter(col("t") >= col("t_signup"))
      .groupBy("user_id").agg(min("t").as("t_view"))
    val purchase = ev.filter(col("event_type") === "purchase")
      .join(view, "user_id")
      .filter(col("t") >= col("t_view"))
      .groupBy("user_id").agg(min("t").as("t_purchase"))
    signup
      .join(view, Seq("user_id"), "left")
      .join(purchase, Seq("user_id"), "left")
      .agg(
        count(lit(1)).as("n_signup"),
        count(col("t_view")).as("n_viewed"),
        count(col("t_purchase")).as("n_purchased"))
  }

  val q84Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS t
      |  FROM events),
      |signup AS (
      |  SELECT user_id, MIN(t) AS t_signup FROM e
      |  WHERE event_type = 'signup' GROUP BY 1),
      |v AS (
      |  SELECT e.user_id, MIN(t) AS t_view
      |  FROM e JOIN signup USING (user_id)
      |  WHERE event_type = 'view' AND t >= t_signup GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, MIN(t) AS t_purchase
      |  FROM e JOIN v USING (user_id)
      |  WHERE event_type = 'purchase' AND t >= t_view GROUP BY 1)
      |SELECT COUNT(*) AS n_signup, COUNT(v.t_view) AS n_viewed,
      |  COUNT(p.t_purchase) AS n_purchased
      |FROM signup LEFT JOIN v USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin

  // ---------------------------------------------------------------- q85
  // Cohort retention: users grouped by first-activity week; per (cohort,
  // weeks-since) distinct active users. The classic retention triangle —
  // two shuffles (first-activity, then cohort cell distinct count).
  def q85Cohort(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val ev = Tables.events(s, d)
      .select(col("user_id"), (unix_micros(col("ts")) / dayUs).cast("long")
        .as("day"))
    val first = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    ev.join(first, "user_id")
      .withColumn("week_n", ((col("day") - col("cohort_day")) / 7).cast("long"))
      .groupBy((col("cohort_day") / 7).cast("long").as("cohort_week"),
        col("week_n"))
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort_week", "week_n")
  }

  val q85Sql: String =
    """WITH e AS (
      |  SELECT user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
      |  FROM events),
      |first AS (
      |  SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY 1)
      |SELECT first.cohort_day // 7 AS cohort_week,
      |  (e.day - first.cohort_day) // 7 AS week_n,
      |  COUNT(DISTINCT e.user_id) AS n_active
      |FROM e JOIN first ON e.user_id = first.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_cube"         -> (q40Cube _),
    "q52_full_outer"   -> (q52FullOuter _),
    "q53_distinct_agg" -> (q53DistinctAgg _),
    "q54_stats"        -> (q54Stats _),
    "q55_argminmax"    -> (q55ArgMinMax _),
    "q56_string_agg"   -> (q56StringAgg _),
    "q57_setops"       -> (q57SetOps _),
    "q58_subqueries"   -> (q58Subqueries _),
    "q59_redact"       -> (q59Redact _),
    "q60_repetition"   -> (q60Repetition _),
    "q61_merge"        -> (q61Merge _),
    "q63_range_frame"  -> (q63RangeFrame _),
    "q64_posexplode"   -> (q64Posexplode _),
    "q67_map_ops"      -> (q67MapOps _),
    "q68_csv_roundtrip" -> (q68CsvRoundtrip _),
    "q69_partition_pruned" -> (q69PartitionPruned _),
    "q70_format_roundtrip" -> (q70FormatRoundtrip _),
    "q72_salted_join"  -> (q72SaltedJoin _),
    "q73_duration_parse" -> (q73DurationParse _),
    "q76_lateral"      -> (q76Lateral _),
    "q78_bucketed_join" -> (q78BucketedJoin _),
    "q79_forward_fill" -> (q79ForwardFill _),
    "q80_schema_evolution" -> (q80SchemaEvolution _),
    "q81_grouping_sets" -> (q81GroupingSets _),
    "q82_sliding_window" -> (q82SlidingWindow _),
    "q84_funnel"       -> (q84Funnel _),
    "q85_cohort"       -> (q85Cohort _),
    "q89_right_outer"  -> (q89RightOuter _))

  val oracles: Map[String, String] = Map(
    "q40_cube"         -> q40Sql,
    "q52_full_outer"   -> q52Sql,
    "q53_distinct_agg" -> q53Sql,
    "q54_stats"        -> q54Sql,
    "q55_argminmax"    -> q55Sql,
    "q56_string_agg"   -> q56Sql,
    "q57_setops"       -> q57Sql,
    "q58_subqueries"   -> q58Sql,
    "q59_redact"       -> q59Sql,
    "q60_repetition"   -> q60Sql,
    "q61_merge"        -> q61Sql,
    "q63_range_frame"  -> q63Sql,
    "q64_posexplode"   -> q64Sql,
    "q67_map_ops"      -> q67Sql,
    "q68_csv_roundtrip" -> q68Sql,
    "q69_partition_pruned" -> q69Sql,
    "q70_format_roundtrip" -> q70Sql,
    "q72_salted_join"  -> q72Sql,
    "q73_duration_parse" -> q73Sql,
    "q76_lateral"      -> q76Sql,
    "q78_bucketed_join" -> q78Sql,
    "q79_forward_fill" -> q79Sql,
    "q80_schema_evolution" -> q80Sql,
    "q81_grouping_sets" -> q81Sql,
    "q82_sliding_window" -> q82Sql,
    "q84_funnel"       -> q84Sql,
    "q85_cohort"       -> q85Sql,
    "q89_right_outer"  -> q89Sql)
}
