package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.matching

/** Round-5 batch 4 (q126-q129): information-theoretic column profiling,
  * hashing-trick feature extraction, PMI collocation mining, and Markov
  * transition matrices — the statistical-profiling family.
  */
object Advanced4 {

  // ---------------------------------------------------------------- q126
  // Mutual information between two categorical columns — the model-free
  // dependence screen feature selection runs over every candidate pair.
  // All probabilities come from EXACT joint/marginal counts (one
  // aggregate + two broadcast marginals); the Σ p·ln(...) accumulation
  // follows q83's float discipline (double sum over ≤|X|·|Y| cells,
  // round(4) absorbs ordering ulps). MI ≥ 0 up to that rounding.
  def q126MutualInfo(s: SparkSession, d: String): DataFrame = {
    val joint = Tables.orders(s, d)
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("nxy"))
    val mx = Tables.orders(s, d).groupBy("o_orderpriority")
      .agg(count(lit(1)).as("nx"))
    val my = Tables.orders(s, d).groupBy("o_orderstatus")
      .agg(count(lit(1)).as("ny"))
    val n = Tables.orders(s, d).select(count(lit(1)).as("n"))
    joint.join(broadcast(mx), Seq("o_orderpriority"))
      .join(broadcast(my), Seq("o_orderstatus"))
      .crossJoin(broadcast(n))
      .select(lit("priority_x_status").as("pair"),
        (col("nxy").cast("double") / col("n") *
          log(col("nxy").cast("double") * col("n") /
            (col("nx").cast("double") * col("ny")))).as("term"),
        col("n"))
      .groupBy("pair")
      .agg(max("n").as("n"), round(sum("term"), 4).as("mi_nats"))
      .orderBy("pair")
  }

  val q126Sql: String =
    """WITH j AS (
      |  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS nxy
      |  FROM orders GROUP BY 1, 2),
      |mx AS (SELECT o_orderpriority, COUNT(*) AS nx FROM orders GROUP BY 1),
      |my AS (SELECT o_orderstatus, COUNT(*) AS ny FROM orders GROUP BY 1),
      |t AS (SELECT COUNT(*) AS n FROM orders)
      |SELECT 'priority_x_status' AS pair, MAX(t.n) AS n,
      |  ROUND(SUM(CAST(j.nxy AS DOUBLE) / t.n *
      |    LN(CAST(j.nxy AS DOUBLE) * t.n /
      |       (CAST(mx.nx AS DOUBLE) * my.ny))), 4) AS mi_nats
      |FROM j JOIN mx USING (o_orderpriority)
      |       JOIN my USING (o_orderstatus)
      |       CROSS JOIN t
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q127
  // Hashing-trick feature extraction (Weinberger et al. '09): terms map
  // to a fixed 64-bucket feature space via md5_lower64 — no vocabulary
  // table, no fit step, identical buckets on every engine and every run
  // (the property that lets feature pipelines shard freely). Output is
  // the per-bucket load profile plus collision pressure (distinct terms
  // per bucket), i.e. the audit that sizes the feature space. Narrow
  // explode + one keyed aggregate.
  def q127FeatureHash(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .select(explode(expr("regexp_extract_all(text, '\\\\S+', 0)")).as("term"))
      .select(col("term"),
        pmod(matching.md5_lower64(col("term")), lit(64L)).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("term")).as("n_terms"),
        min("term").as("first_term"))
      .orderBy("bucket")
  }

  val q127Sql: String =
    """WITH t AS (
      |  SELECT unnest(regexp_extract_all(text, '\S+')) AS term
      |  FROM documents),
      |h AS (
      |  -- md5_number_lower is UBIGINT; 2^64 = 0 (mod 64), so the unsigned
      |  -- residue equals Spark's pmod over the signed reinterpretation
      |  SELECT term, CAST(md5_number_lower(term) % 64 AS BIGINT) AS bucket
      |  FROM t)
      |SELECT bucket, COUNT(*) AS n_tokens,
      |  COUNT(DISTINCT term) AS n_terms, MIN(term) AS first_term
      |FROM h GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q128
  // PMI collocation mining (the phrase-detection pass word2vec-style
  // pipelines run before tokenization): adjacent-word bigrams scored by
  // pointwise mutual information from exact bigram/unigram counts.
  // Rank keys are the ROUNDED pmi plus the bigram text, so float ulps
  // cannot flip the ordering (the q74 ranking rule). Two token-count
  // aggregates + broadcast unigrams.
  def q128PmiCollocations(s: SparkSession, d: String): DataFrame = {
    def toks(df: DataFrame): DataFrame = df.select(col("doc_id"),
      posexplode_outer(expr("regexp_extract_all(text, '\\\\S+', 0)"))
        .as(Seq("pos", "w")))
      .where(col("w").isNotNull)
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val bigrams = toks(Tables.documents(s, d))
      .withColumn("nxt", lead("w", 1).over(w))
      .where(col("nxt").isNotNull)
      .groupBy(col("w").as("w1"), col("nxt").as("w2"))
      .agg(count(lit(1)).as("nb"))
    val unis = toks(Tables.documents(s, d))
      .groupBy(col("w")).agg(count(lit(1)).as("nu"))
    val totals = bigrams.select(sum("nb").as("tb")).crossJoin(
      unis.select(sum("nu").as("tu")))
    bigrams
      .join(broadcast(unis.withColumnRenamed("w", "w1")
        .withColumnRenamed("nu", "n1")), Seq("w1"))
      .join(broadcast(unis.withColumnRenamed("w", "w2")
        .withColumnRenamed("nu", "n2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .where(col("nb") >= 20)
      .select(concat(col("w1"), lit(" "), col("w2")).as("bigram"), col("nb"),
        round(log((col("nb").cast("double") / col("tb")) /
          ((col("n1").cast("double") / col("tu")) *
            (col("n2").cast("double") / col("tu")))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(50)
  }

  val q128Sql: String =
    """WITH tok AS (
      |  -- parallel unnests zip positionally in DuckDB: (pos, word) pairs
      |  SELECT doc_id, unnest(range(1, len(ws) + 1)) AS pos, unnest(ws) AS w
      |  FROM (SELECT doc_id, regexp_extract_all(text, '\S+') AS ws
      |        FROM documents)),
      |big AS (
      |  SELECT w AS w1, LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      |  FROM tok),
      |bc AS (
      |  SELECT w1, w2, COUNT(*) AS nb FROM big WHERE w2 IS NOT NULL
      |  GROUP BY 1, 2),
      |uc AS (SELECT w, COUNT(*) AS nu FROM tok GROUP BY 1),
      |tt AS (SELECT (SELECT SUM(nb) FROM bc) AS tb,
      |              (SELECT SUM(nu) FROM uc) AS tu)
      |SELECT bc.w1 || ' ' || bc.w2 AS bigram, bc.nb,
      |  ROUND(LN((CAST(bc.nb AS DOUBLE) / tt.tb) /
      |    ((CAST(u1.nu AS DOUBLE) / tt.tu) *
      |     (CAST(u2.nu AS DOUBLE) / tt.tu))), 4) AS pmi
      |FROM bc JOIN uc u1 ON u1.w = bc.w1
      |        JOIN uc u2 ON u2.w = bc.w2
      |        CROSS JOIN tt
      |WHERE bc.nb >= 20
      |ORDER BY pmi DESC, bigram LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- q129
  // Markov transition matrix over per-user event sequences — the
  // product-analytics "what happens next" profile (and the generative
  // model behind session simulation). One window sort per user partition
  // produces the (from, to) pairs; exact counts normalize per source
  // state. The window orders each USER's events only — the entity key
  // shards the sort at any scale.
  def q129Transitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = pairs.groupBy("from_type").agg(sum("n").as("tot"))
    pairs.join(broadcast(fromTotals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("tot"), 6).as("p"))
      .orderBy("from_type", "to_type")
  }

  val q129Sql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    LEAD(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |pairs AS (
      |  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
      |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |ft AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
      |       FROM pairs GROUP BY 1)
      |SELECT p.from_type, p.to_type, p.n,
      |  ROUND(CAST(p.n AS DOUBLE) / ft.tot, 6) AS p
      |FROM pairs p JOIN ft USING (from_type)
      |ORDER BY p.from_type, p.to_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q126_mutual_info"      -> (q126MutualInfo _),
    "q127_feature_hash"     -> (q127FeatureHash _),
    "q128_pmi_collocations" -> (q128PmiCollocations _),
    "q129_transitions"      -> (q129Transitions _))

  val oracles: Map[String, String] = Map(
    "q126_mutual_info"      -> q126Sql,
    "q127_feature_hash"     -> q127Sql,
    "q128_pmi_collocations" -> q128Sql,
    "q129_transitions"      -> q129Sql)
}
