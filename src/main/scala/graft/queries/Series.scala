package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Time-series / warehouse completeness batch: dense-grid gap-fill
  * (resampling), SCD-2 validity-interval construction, and a one-step
  * link-authority (PageRank-style) iteration — three operator shapes a
  * complete analytics engine is expected to cover that none of the
  * earlier families exercise.
  */
object Series {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")
  private def dsumSql(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(18,2))) AS DOUBLE)"

  // ---------------------------------------------------------------- q96
  // Dense-grid gap-fill: hourly event counts per type on a COMPLETE
  // hour × type grid, missing cells zero-filled — the resampling step
  // every downstream time-series model assumes has already happened.
  // Scale shape: the grid is generated from a 1-row bounds aggregate
  // (sequence + explode, never materialized on the driver), the type
  // dimension broadcasts, and the left join keys on (hour, type) — the
  // same exchange the counts aggregate already produced. At 100 TB the
  // grid side is |hours| × |types| rows — trivially small next to the
  // fact side, which is touched exactly once.
  def q96Gapfill(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.events(s, d)
      .select(date_trunc("hour", col("ts")).as("hour"), col("event_type"),
        col("value"))
      .groupBy("hour", "event_type")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
    // independent reads for bounds/types: grid generation must not share
    // lineage with the aggregate it left-joins (AMBIGUOUS_SELF_JOIN rule)
    val bounds = Tables.events(s, d)
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
    val types = Tables.events(s, d).select("event_type").distinct()
    val grid = bounds
      .select(explode(sequence(col("h0"), col("h1"),
        expr("interval 1 hour"))).as("hour"))
      .crossJoin(broadcast(types))
    grid.join(counts, Seq("hour", "event_type"), "left")
      .select(col("hour"), col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy("hour", "event_type")
  }

  val q96Sql: String =
    s"""WITH b AS (
       |  SELECT date_trunc('hour', MIN(ts)) AS h0,
       |         date_trunc('hour', MAX(ts)) AS h1
       |  FROM events),
       |grid AS (
       |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
       |  FROM b),
       |types AS (SELECT DISTINCT event_type FROM events),
       |c AS (
       |  SELECT date_trunc('hour', ts) AS hour, event_type,
       |    COUNT(*) AS n, ${dsumSql("value")} AS sv
       |  FROM events GROUP BY 1, 2)
       |SELECT g.hour, t.event_type,
       |  COALESCE(c.n, 0) AS n_events, COALESCE(c.sv, 0.0) AS sum_value
       |FROM grid g CROSS JOIN types t
       |LEFT JOIN c ON c.hour = g.hour AND c.event_type = t.event_type
       |ORDER BY g.hour, t.event_type""".stripMargin

  // ---------------------------------------------------------------- q97
  // SCD-2 validity intervals: each customer's order history becomes a
  // chain of [valid_from, valid_to) status rows, open-ended on the
  // current one — the slowly-changing-dimension build every warehouse
  // needs when snapshotting mutable entities. One window sort per
  // customer partition; `lead` closes each interval with the next
  // version's start. Deterministic tiebreak on o_orderkey.
  def q97Scd2(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("valid_from", "o_orderkey")
    Tables.orders(s, d)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        col("o_orderdate").as("valid_from"))
      .withColumn("valid_to", lead("valid_from", 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("o_custkey", "valid_from", "o_orderkey")
  }

  val q97Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderstatus,
      |  o_orderdate AS valid_from,
      |  LEAD(o_orderdate) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) AS valid_to,
      |  LEAD(o_orderdate) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
      |FROM orders WHERE o_custkey < 100
      |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q98
  // One link-authority (PageRank) iteration over a deterministic
  // synthetic link graph: every document links to (7·id+13) mod N and
  // (13·id+7) mod N, all ranks start at 1, one update r' = 0.15 +
  // 0.85·Σ r/outdeg over in-links. Domain/page authority is a standard
  // corpus-quality prior at training-data scale; one iteration keeps a
  // closed-form oracle while exercising the iterate's exact shuffle
  // shape (contribs keyed by dst — the same plan loops N times with
  // localCheckpoint per round, like q71's CC). Out-degree is the
  // constant 2, so every arithmetic step is exactly-rounded IEEE on
  // identical inputs; the in-degree SUM is integer-exact.
  def q98LinkAuthority(s: SparkSession, d: String): DataFrame = {
    val n = Tables.documents(s, d).select(count(lit(1)).as("n"))
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val edges = docs.crossJoin(broadcast(n))
      .select(col("doc_id").as("src"),
        explode(array((col("doc_id") * 7 + 13) % col("n"),
          (col("doc_id") * 13 + 7) % col("n"))).as("dst"))
    val contribs = edges.groupBy("dst")
      .agg(count(lit(1)).as("in_deg"))
    // second independent read for the vertex side of the left join
    Tables.documents(s, d).select(col("doc_id"))
      .join(contribs, col("doc_id") === col("dst"), "left")
      .select(col("doc_id"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        round(lit(0.15) +
          lit(0.85) * (coalesce(col("in_deg"), lit(0L)) * lit(0.5)), 9)
          .as("rank"))
      .orderBy("doc_id")
  }

  val q98Sql: String =
    """WITH n AS (SELECT COUNT(*) AS n FROM documents),
      |e AS (
      |  SELECT doc_id AS src, (doc_id * 7 + 13) % n.n AS dst
      |  FROM documents CROSS JOIN n
      |  UNION ALL
      |  SELECT doc_id, (doc_id * 13 + 7) % n.n FROM documents CROSS JOIN n),
      |c AS (SELECT dst, COUNT(*) AS in_deg FROM e GROUP BY 1)
      |SELECT d.doc_id, COALESCE(c.in_deg, 0) AS in_deg,
      |  ROUND(0.15 + 0.85 * (COALESCE(c.in_deg, 0) * 0.5), 9) AS rank
      |FROM documents d LEFT JOIN c ON c.dst = d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // --------------------------------------------------------------- q101
  // Data-quality constraint suite (the Deequ-shaped expectations check a
  // production pipeline gates on): each rule computes one METRIC over the
  // data plus a pass verdict against its threshold — uniqueness of the
  // orders PK, referential integrity of the orders→customer FK (orphan
  // count via anti-join semantics), completeness (non-null fraction),
  // domain-range conformity, and compound-key uniqueness on lineitem.
  // Every metric is a count ratio (exact integer counts, one double
  // division — bit-identical cross-engine). Scale shape: one pass per
  // constrained table (the single-table metrics share a scan inside one
  // aggregate), plus one broadcast-able anti-join for the FK check; at
  // 100 TB this is the same budget the data already pays for ingestion
  // accounting.
  def q101DqChecks(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val pkUnique = orders.agg(
      lit("orders_pk_unique").as("check_name"),
      round(countDistinct(col("o_orderkey")).cast("double") /
        count(lit(1)), 6).as("metric"))
      .withColumn("passed", col("metric") === 1.0)
    val complete = orders.agg(
      lit("orders_totalprice_complete").as("check_name"),
      round(count(col("o_totalprice")).cast("double") /
        count(lit(1)), 6).as("metric"))
      .withColumn("passed", col("metric") === 1.0)
    val range = li.agg(
      lit("lineitem_quantity_in_range").as("check_name"),
      round(count(when(col("l_quantity").between(1, 50), 1)).cast("double") /
        count(lit(1)), 6).as("metric"))
      .withColumn("passed", col("metric") === 1.0)
    val compound = li.agg(
      lit("lineitem_compound_key_unique").as("check_name"),
      round(countDistinct(col("l_orderkey"), col("l_linenumber"))
        .cast("double") / count(lit(1)), 6).as("metric"))
      .withColumn("passed", col("metric") === 1.0)
    val orphans = orders
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(lit("orders_custkey_fk_orphans").as("check_name"),
        count(lit(1)).cast("double").as("metric"))
      .withColumn("passed", col("metric") === 0.0)
    pkUnique.unionByName(complete).unionByName(range)
      .unionByName(compound).unionByName(orphans)
      .orderBy("check_name")
  }

  val q101Sql: String =
    """SELECT 'orders_pk_unique' AS check_name,
      |  ROUND(CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(*), 6) AS metric,
      |  ROUND(CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) / COUNT(*), 6) = 1.0 AS passed
      |FROM orders
      |UNION ALL
      |SELECT 'orders_totalprice_complete',
      |  ROUND(CAST(COUNT(o_totalprice) AS DOUBLE) / COUNT(*), 6),
      |  ROUND(CAST(COUNT(o_totalprice) AS DOUBLE) / COUNT(*), 6) = 1.0
      |FROM orders
      |UNION ALL
      |SELECT 'lineitem_quantity_in_range',
      |  ROUND(CAST(COUNT(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 END) AS DOUBLE)
      |    / COUNT(*), 6),
      |  ROUND(CAST(COUNT(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 1 END) AS DOUBLE)
      |    / COUNT(*), 6) = 1.0
      |FROM lineitem
      |UNION ALL
      |SELECT 'lineitem_compound_key_unique',
      |  ROUND(CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS DOUBLE) / COUNT(*), 6),
      |  ROUND(CAST(COUNT(DISTINCT (l_orderkey, l_linenumber)) AS DOUBLE) / COUNT(*), 6)
      |    = 1.0
      |FROM lineitem
      |UNION ALL
      |SELECT 'orders_custkey_fk_orphans',
      |  CAST(COUNT(*) AS DOUBLE), COUNT(*) = 0
      |FROM orders o WHERE NOT EXISTS (
      |  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |ORDER BY check_name""".stripMargin

  // --------------------------------------------------------------- q102
  // XML sink + source round-trip — Spark 4 ships the (formerly external)
  // XML data source in spark-sql, completing the built-in format matrix
  // alongside q68 (CSV) and q70 (ORC/JSON). A typed slice of orders is
  // written as <order> row elements and read back with an explicit
  // schema; the aggregate over the round-tripped frame must hash-match
  // the oracle computed on the ORIGINAL parquet — longs, strings, and
  // shortest-repr doubles all survive the text encoding bit-exactly.
  def q102XmlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_xml_roundtrip").getAbsolutePath
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .filter(col("o_orderkey") % 7 === 0)
    o.write.mode("overwrite").option("rowTag", "order").format("xml").save(dir)
    s.read.schema(o.schema).option("rowTag", "order").format("xml").load(dir)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
        min("o_orderkey").as("first_key"))
      .orderBy("o_orderstatus")
  }

  val q102Sql: String =
    s"""SELECT o_orderstatus, COUNT(*) AS n,
       |  ${dsumSql("o_totalprice")} AS total,
       |  MIN(o_orderkey) AS first_key
       |FROM orders WHERE o_orderkey % 7 = 0
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- q104
  // Recursive CTE (new in Spark 4): bounded multi-hop reachability over
  // q98's deterministic link graph — 3 seed documents, 4 hops along
  // out-degree-2 edges, grouped into (first-reached hop, path count) per
  // reachable doc. The SAME SQL text runs on both engines (Spark
  // executes it via spark.sql over the registered views; DuckDB is the
  // oracle), exercising the iterate-until-bound shape declaratively —
  // the engine loops the plan instead of the driver (contrast q71's
  // driver-looped CC, which that pattern needs for convergence-dependent
  // rounds; a fixed-depth walk belongs in the recursive CTE).
  def q104RecursiveCte(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    s.sql(q104Sql)
  }

  val q104Sql: String =
    """WITH RECURSIVE cnt AS (SELECT COUNT(*) AS n FROM documents),
      |e AS (
      |  SELECT doc_id AS src, (doc_id * 7 + 13) % cnt.n AS dst
      |  FROM documents CROSS JOIN cnt
      |  UNION ALL
      |  SELECT doc_id, (doc_id * 13 + 7) % cnt.n
      |  FROM documents CROSS JOIN cnt),
      |hops AS (
      |  SELECT doc_id, 0 AS hop FROM documents WHERE doc_id < 3
      |  UNION ALL
      |  SELECT e.dst, h.hop + 1
      |  FROM hops h JOIN e ON e.src = h.doc_id
      |  WHERE h.hop < 4)
      |SELECT doc_id, MIN(hop) AS min_hop, COUNT(*) AS n_paths
      |FROM hops GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- q105
  // Triangle counting — the canonical multi-way self-join graph analytic,
  // over a circulant co-citation graph (every doc links to its next two
  // neighbors mod N, so consecutive triples close exactly N triangles).
  // The LEAST/GREATEST edge canonicalization is THE at-scale trick: each
  // triangle is enumerated exactly once at its lowest vertex, so the
  // 3-way join explores ordered wedges only (never the 6 permutations),
  // and every join is equi-keyed — no cartesian anywhere. Same SQL text
  // on both engines.
  def q105Triangles(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    // Spark INLINES WITH-CTEs, so `und` (a distinct over two union
    // arms) was evaluated once per reference — 3× in the wedge join,
    // 514 physical-plan lines (r19 opt round; guide §4.4 duplicated
    // subtrees). Materialize it once and join the blocks; the oracle
    // keeps the single-text CTE form (DuckDB materializes CTEs itself).
    val und = graft.operators.Lineage.cut(s.sql(
      """WITH cnt AS (SELECT COUNT(*) AS n FROM documents),
        |raw AS (
        |  SELECT doc_id AS src, (doc_id + 1) % cnt.n AS dst
        |  FROM documents CROSS JOIN cnt
        |  UNION ALL
        |  SELECT doc_id, (doc_id + 2) % cnt.n FROM documents CROSS JOIN cnt)
        |SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        |FROM raw WHERE src <> dst""".stripMargin))
    // wedge join over the checkpointed frame directly (no session-global
    // temp view: parallel suites share ONE SparkSession, and a shared
    // view name is the documented cross-suite-flake pattern). The
    // aliasing selects mint fresh exprIds, so the three-way self-join
    // never trips AMBIGUOUS_SELF_JOIN.
    val e1 = und.select(col("a").as("a1"), col("b").as("b1"))
    val e2 = und.select(col("a").as("a2"), col("b").as("b2"))
    val e3 = und.select(col("a").as("a3"), col("b").as("b3"))
    e1.join(e2, col("a2") === col("b1"))
      .join(e3, col("a3") === col("a1") && col("b3") === col("b2"))
      .groupBy(col("a1"))
      .agg(count(lit(1)).as("n_triangles"))
      .select(col("a1").as("doc_id"), col("n_triangles"))
      .orderBy("doc_id")
  }

  val q105Sql: String =
    """WITH cnt AS (SELECT COUNT(*) AS n FROM documents),
      |raw AS (
      |  SELECT doc_id AS src, (doc_id + 1) % cnt.n AS dst
      |  FROM documents CROSS JOIN cnt
      |  UNION ALL
      |  SELECT doc_id, (doc_id + 2) % cnt.n FROM documents CROSS JOIN cnt),
      |und AS (
      |  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      |  FROM raw WHERE src <> dst),
      |tri AS (
      |  SELECT e1.a, e1.b, e2.b AS c
      |  FROM und e1
      |  JOIN und e2 ON e2.a = e1.b
      |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
      |SELECT a AS doc_id, COUNT(*) AS n_triangles
      |FROM tri GROUP BY a ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q96_gapfill"        -> (q96Gapfill _),
    "q97_scd2"           -> (q97Scd2 _),
    "q98_link_authority" -> (q98LinkAuthority _),
    "q101_dq_checks"     -> (q101DqChecks _),
    "q102_xml_roundtrip" -> (q102XmlRoundtrip _),
    "q104_recursive_cte" -> (q104RecursiveCte _),
    "q105_triangles"     -> (q105Triangles _))

  val oracles: Map[String, String] = Map(
    "q96_gapfill"        -> q96Sql,
    "q97_scd2"           -> q97Sql,
    "q98_link_authority" -> q98Sql,
    "q101_dq_checks"     -> q101Sql,
    "q102_xml_roundtrip" -> q102Sql,
    "q104_recursive_cte" -> q104Sql,
    "q105_triangles"     -> q105Sql)
}
