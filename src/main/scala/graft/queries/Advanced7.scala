package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.operators.Scan

/** Round-6 batch (q135-q139): Lorenz concentration deciles on the
  * distributed rank scan, BM25 retrieval scoring, ordered funnel
  * conversion, 7-day rolling distinct users, and weekly retention
  * cohorts — the product/retrieval analytics family, each shaped so no
  * stage holds more than a bounded slice of the input.
  */
object Advanced7 {

  // ---------------------------------------------------------------- q135
  // Lorenz curve by revenue decile — "the top 10% of customers drive x%
  // of revenue" as a table: per-customer totals (one shuffle), the
  // corpus-wide rank from operators.Scan (deterministic two-pass — no
  // single-partition window over the entity table), NTILE(10) as pure
  // arithmetic on (rank, n), then cumulative share over the TEN-row
  // decile table (the only global window, bounded by construction).
  // Revenue stays decimal-exact until the final share division.
  def q135LorenzDeciles(s: SparkSession, d: String): DataFrame = {
    val perCust = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
    val ranked = Scan.withGlobalRowNumber(perCust,
      Seq(col("rev"), col("o_custkey")), "rn", totalOut = Some("n_total"))
    val byDecile = ranked
      .withColumn("decile", Scan.ntileBucket(col("rn"), col("n_total"), 10))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"), sum("rev").as("drev"))
    val wc = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wa = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byDecile
      .withColumn("cum", sum("drev").over(wc))
      .withColumn("tot", sum("drev").over(wa))
      .select(col("decile"), col("n_customers"),
        round(col("drev").cast("double"), 2).as("decile_rev"),
        round(col("cum").cast("double") / col("tot").cast("double"), 6)
          .as("cum_share"))
      .orderBy("decile")
  }

  val q135Sql: String =
    """WITH pc AS (
      |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT rev, NTILE(10) OVER (ORDER BY rev, o_custkey) AS decile
      |  FROM pc),
      |d AS (
      |  SELECT decile, COUNT(*) AS n_customers, SUM(rev) AS drev
      |  FROM r GROUP BY 1)
      |SELECT decile, n_customers,
      |  ROUND(CAST(drev AS DOUBLE), 2) AS decile_rev,
      |  ROUND(CAST(SUM(drev) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / CAST(SUM(drev) OVER () AS DOUBLE), 6) AS cum_share
      |FROM d ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------- q136
  // BM25 retrieval scoring (Robertson/Okapi, k1=1.2, b=0.75) for a fixed
  // query term set — THE lexical ranking function behind retrieval-
  // augmented pipelines. The token scan produces (doc, term, tf) with
  // doc length attached; corpus stats (N, Σdl) come from a SECOND
  // text-only scan — deliberately: deriving them from the token stream
  // would shuffle every token on doc_id, and a narrow columnar re-scan
  // is cheaper than that exchange at any corpus size. Document
  // frequencies reduce to a |query|-row table. idf is quantized at 6
  // (identical
  // LN inputs cross-engine), per-term contributions at DECIMAL(18,8) so
  // the per-doc sum is order-insensitive, final score rounded at 4 and
  // ranked on the ROUNDED value with doc_id tiebreak.
  def q136Bm25(s: SparkSession, d: String): DataFrame = {
    val qterms = Seq("spark", "table", "hash")
    val k1 = 1.2
    val b = 0.75
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
        explode_outer(col("ws")).as("term"))
    val corpus = Tables.documents(s, d)
      .select(size(split(col("text"), " ")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val tf = tok.where(col("term").isin(qterms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = dfreq.crossJoin(broadcast(corpus))
      .select(col("term"),
        round(log((col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)), 6).as("idf"))
    tf.join(broadcast(idf), "term")
      .crossJoin(broadcast(corpus))
      .withColumn("contrib",
        (col("idf") * (col("tf") * (lit(k1) + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
            lit(b) * col("dl") / (col("sum_dl").cast("double") / col("n_docs")))))
          .cast(DecimalType(18, 8)))
      .groupBy("doc_id")
      .agg(round(sum("contrib").cast("double"), 4).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(desc("bm25"), col("doc_id"))
  }

  val q136Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |    unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |corpus AS (
      |  SELECT COUNT(*) AS n_docs,
      |    SUM(len(string_split(text, ' '))) AS sum_dl
      |  FROM documents),
      |tf AS (
      |  SELECT doc_id, dl, term, COUNT(*) AS tf FROM tok
      |  WHERE term IN ('spark', 'table', 'hash') GROUP BY 1, 2, 3),
      |idf AS (
      |  SELECT term,
      |    ROUND(LN((c.n_docs - df + 0.5) / (df + 0.5) + 1.0), 6) AS idf
      |  FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1)
      |  CROSS JOIN corpus c)
      |SELECT t.doc_id,
      |  ROUND(CAST(SUM(CAST(i.idf * (t.tf * (1.2 + 1)) /
      |    (t.tf + 1.2 * (1.0 - 0.75 +
      |      0.75 * t.dl / (CAST(c.sum_dl AS DOUBLE) / c.n_docs)))
      |    AS DECIMAL(18,8))) AS DOUBLE), 4) AS bm25,
      |  COUNT(*) AS n_terms_hit
      |FROM tf t JOIN idf i ON i.term = t.term CROSS JOIN corpus c
      |GROUP BY 1 ORDER BY bm25 DESC, doc_id""".stripMargin

  // ---------------------------------------------------------------- q137
  // Ordered funnel conversion (view -> click -> purchase): each step
  // counts users whose FIRST step-event strictly follows their first
  // completion of the previous step — the product-analytics query that
  // naive per-type counts get wrong (a purchase before any view is not a
  // conversion). Three keyed aggregates, each one shuffle on user_id;
  // timestamps compare as epoch MICROSECONDS on both engines so the
  // nanosecond parquet precision cannot make strictness diverge.
  def q137Funnel(s: SparkSession, d: String): DataFrame = {
    def ev(t: String) = Tables.events(s, d)
      .where(col("event_type") === t)
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
    val v = ev("view").groupBy("user_id").agg(min("t").as("t1"))
    val c = ev("click").join(v, "user_id").where(col("t") > col("t1"))
      .groupBy("user_id").agg(min("t").as("t2"))
    val p = ev("purchase").join(c, "user_id").where(col("t") > col("t2"))
      .groupBy("user_id").agg(min("t").as("t3"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("n_click"))))
      .crossJoin(broadcast(p.agg(count(lit(1)).as("n_purchase"))))
      .select(lit("view>click>purchase").as("funnel"),
        col("n_view"), col("n_click"), col("n_purchase"),
        round(col("n_click").cast("double") / col("n_view"), 6)
          .as("view_to_click"),
        round(col("n_purchase").cast("double") / col("n_click"), 6)
          .as("click_to_purchase"),
        round(col("n_purchase").cast("double") / col("n_view"), 6)
          .as("overall"))
      .orderBy("funnel")
  }

  val q137Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
      |v AS (SELECT user_id, MIN(t) AS t1 FROM e
      |      WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, MIN(e.t) AS t2
      |      FROM e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.t > v.t1 GROUP BY 1),
      |p AS (SELECT e.user_id, MIN(e.t) AS t3
      |      FROM e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.t > c.t2 GROUP BY 1)
      |SELECT 'view>click>purchase' AS funnel,
      |  (SELECT COUNT(*) FROM v) AS n_view,
      |  (SELECT COUNT(*) FROM c) AS n_click,
      |  (SELECT COUNT(*) FROM p) AS n_purchase,
      |  ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
      |    / (SELECT COUNT(*) FROM v), 6) AS view_to_click,
      |  ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
      |    / (SELECT COUNT(*) FROM c), 6) AS click_to_purchase,
      |  ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
      |    / (SELECT COUNT(*) FROM v), 6) AS overall
      |ORDER BY funnel""".stripMargin

  // ---------------------------------------------------------------- q138
  // 7-day rolling distinct users per day — the DAU/WAU-style sliding
  // distinct count, on operators.RollingDistinct.exact (width and grain
  // parameterized there; the scale commentary lives on the operator).
  def q138RollingDistinct(s: SparkSession, d: String): DataFrame =
    graft.operators.RollingDistinct.exact(
        Tables.events(s, d).select(col("ts"), col("user_id")),
        col("ts"), col("user_id"), grain = "day", width = 7,
        out = "users_7d")
      .select(col("period").as("day"), col("users_7d"))
      .orderBy("day")

  val q138Sql: String =
    """WITH du AS (
      |  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
      |days AS (
      |  SELECT DISTINCT date_trunc('day', ts) AS wday FROM events)
      |SELECT d.wday AS day, COUNT(DISTINCT u.user_id) AS users_7d
      |FROM days d JOIN du u
      |  ON d.wday BETWEEN u.day AND u.day + INTERVAL 6 DAY
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q139
  // Weekly retention cohorts: users grouped by first-seen week, distinct
  // actives per (cohort, weeks-since) cell — the retention triangle.
  // First-seen is one aggregate on user; the join back is on the same
  // key (co-partitioned); weeks-since is exact integer arithmetic on
  // epoch microseconds (both engines truncate weeks to Monday), so the
  // cell keys are bit-identical.
  def q139Retention(s: SparkSession, d: String): DataFrame = {
    val firstWeek = Tables.events(s, d)
      .groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).as("cohort"))
    Tables.events(s, d) // independent read for the activity side
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .join(firstWeek, "user_id")
      .withColumn("weeks_since",
        ((unix_micros(col("wk")) - unix_micros(col("cohort"))) /
          lit(604800000000L)).cast("long"))
      .groupBy("cohort", "weeks_since")
      .agg(countDistinct("user_id").as("active_users"))
      .orderBy("cohort", "weeks_since")
  }

  val q139Sql: String =
    """WITH fw AS (
      |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
      |  FROM events GROUP BY 1)
      |SELECT f.cohort,
      |  (epoch_us(date_trunc('week', e.ts)) - epoch_us(f.cohort))
      |    // 604800000000 AS weeks_since,
      |  COUNT(DISTINCT e.user_id) AS active_users
      |FROM events e JOIN fw f ON e.user_id = f.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q140
  // Exact equi-depth (equal-frequency) histogram of order prices — the
  // feature-binning complement of q124's equi-width bins, and the
  // binning a quantile-robust model wants. Exact at any scale: the rank
  // comes from operators.Scan, the bin from NTILE arithmetic — no
  // global sort, no buffering percentile aggregate. Per-bin revenue is
  // decimal-routed.
  def q140EquidepthBins(s: SparkSession, d: String): DataFrame = {
    val vals = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
    Scan.withGlobalRowNumber(vals,
        Seq(col("o_totalprice"), col("o_orderkey")), "rn",
        totalOut = Some("n_total"))
      .withColumn("bin", Scan.ntileBucket(col("rn"), col("n_total"), 20))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_rows"),
        round(min("o_totalprice"), 2).as("lo"),
        round(max("o_totalprice"), 2).as("hi"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
          .as("bin_rev"))
      .orderBy("bin")
  }

  val q140Sql: String =
    """WITH r AS (
      |  SELECT o_totalprice,
      |    NTILE(20) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      |  FROM orders)
      |SELECT bin, COUNT(*) AS n_rows,
      |  ROUND(MIN(o_totalprice), 2) AS lo,
      |  ROUND(MAX(o_totalprice), 2) AS hi,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bin_rev
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q141
  // Exact weighted median (extended price weighted by quantity) — the
  // robust-statistics primitive percentile_disc cannot express and a
  // buffering UDAF cannot scale. Shape: operators.Scan exclusive running
  // weight sum over the value order with the grand total riding the same
  // bucket-summary broadcast (ONE pass over the fact), median = smallest
  // value whose INCLUSIVE cumulative weight reaches half the total. All
  // cumulative arithmetic on exact integer weights.
  def q141WeightedMedian(s: SparkSession, d: String): DataFrame = {
    val t = Tables.lineitem(s, d)
      .select(col("l_extendedprice").as("v"),
        col("l_quantity").cast("long").as("w"),
        col("l_orderkey"), col("l_linenumber"))
    val ord = Seq(col("v"), col("l_orderkey"), col("l_linenumber"))
    Scan.withRunningSum(t, ord, col("w"), "cw_excl", totalOut = Some("tw"))
      .where((coalesce(col("cw_excl"), lit(0L)) + col("w")) * 2 >= col("tw"))
      .groupBy(lit("extendedprice_by_qty").as("measure"))
      .agg(round(min("v"), 2).as("weighted_median"), max("tw").as("total_weight"))
      .orderBy("measure")
  }

  val q141Sql: String =
    """WITH t AS (
      |  SELECT l_extendedprice AS v, CAST(l_quantity AS BIGINT) AS w,
      |    l_orderkey, l_linenumber
      |  FROM lineitem),
      |c AS (
      |  SELECT v, w,
      |    SUM(w) OVER (ORDER BY v, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
      |    (SELECT CAST(SUM(w) AS BIGINT) FROM t) AS tw
      |  FROM t)
      |SELECT 'extendedprice_by_qty' AS measure,
      |  ROUND(MIN(v), 2) AS weighted_median, MAX(tw) AS total_weight
      |FROM c WHERE cw * 2 >= tw
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q142
  // Longest consecutive-active-day streak per user — the gaps-and-islands
  // problem (day minus dense row number is constant within an island).
  // The window is PARTITIONED on the entity key, so it shards freely;
  // date arithmetic stays in whole days (DATE type both engines) so
  // island keys are bit-identical.
  def q142Streaks(s: SparkSession, d: String): DataFrame = {
    val du = Tables.events(s, d)
      .select(col("user_id"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("day")
    du.withColumn("rn", row_number().over(w))
      .withColumn("grp", expr("date_sub(day, rn)"))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(max("len").as("longest_streak"), count(lit(1)).as("n_streaks"))
      .orderBy("user_id")
  }

  val q142Sql: String =
    """WITH du AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      |  FROM events),
      |r AS (
      |  SELECT user_id, day,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn
      |  FROM du),
      |i AS (
      |  SELECT user_id, day - CAST(rn AS INTEGER) AS grp, COUNT(*) AS len
      |  FROM r GROUP BY 1, 2)
      |SELECT user_id, MAX(len) AS longest_streak, COUNT(*) AS n_streaks
      |FROM i GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q143
  // Set-similarity join with the full PPJoin filter stack (Xiao et al.)
  // at Jaccard >= 0.95 within language — the recall-ONE exact
  // alternative to LSH for high thresholds. Three lossless pruning
  // bounds, all in EXACT integer arithmetic (a float t*n rounds up at
  // exact multiples and silently breaks the recall guarantee):
  //  - prefix filter: sets with J >= t and |x| - ceil(t|x|) + 1
  //    prefixes under a COMMON rarity order must share a prefix token
  //    (pigeonhole on |intersect| >= ceil(t*max(|a|,|b|)));
  //  - length filter: J >= t forces ceil(t|a|) <= |b| (and
  //    symmetrically), joined as a predicate;
  //  - positional filter: a prefix match at positions (ra, rb) caps the
  //    overlap at 1 + min(|a|-ra, |b|-rb), which must reach the Jaccard
  //    overlap requirement alpha = ceil(t/(1+t)*(|a|+|b|)) — on this
  //    corpus it keeps only the first ~2 prefix positions pair-eligible.
  // The exact Jaccard verify then touches candidates, never all pairs.
  // The oracle is the brute-force all-pairs definition itself. This
  // corpus is ADVERSARIAL for similarity joins (small shared vocabulary,
  // mean pairwise J = 0.62) — even DuckDB's brute force needs ~60 s at
  // sf0.1 — which is exactly why the filter stack, not an all-pairs
  // loop, is the operator.
  def q143PpJoin(s: SparkSession, d: String): DataFrame = {
    // word-token Jaccard at t = 19/20 on operators.SetSimJoin — the full
    // filter stack (prefix/length/joint-prefix/positional, exact integer
    // bounds) and the once-materialized prefix stage live on the
    // operator; q149 runs the same operator over character 3-grams.
    // tokenize once (q149's pattern): the operator consumes its input
    // four times, and the split+distinct projection is the per-pass cost
    val tokenSets = graft.operators.Lineage.cut(
      Tables.documents(s, d).select(col("doc_id"), col("lang"),
        array_distinct(split(col("text"), " ")).as("toks")))
    graft.operators.SetSimJoin.selfJoin(
        () => tokenSets, "doc_id", "lang", "toks", tNum = 19, tDen = 20)
      .orderBy("ia", "ib")
  }

  val q143Sql: String =
    """WITH d AS (
      |  SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
      |  FROM documents)
      |SELECT a.doc_id AS ia, b.doc_id AS ib,
      |  ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.toks, b.toks))), 6) AS jaccard
      |FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.95
      |ORDER BY ia, ib""".stripMargin

  // ---------------------------------------------------------------- q144
  // Rolling 7-day distinct users via MERGEABLE HLL sketches — the 100 TB
  // path for q138, on operators.RollingDistinct.approx (scale shape
  // documented there). q19's certification pattern: the estimate is
  // checked in-engine against the exact q138 twin and only the exact
  // count + tolerance verdict are emitted (sketch bits are
  // engine-specific, verdicts are not). lgConfigK=14 gives ~0.8%
  // standard error — 5% is a wide margin.
  def q144RollingHll(s: SparkSession, d: String): DataFrame = {
    val merged = graft.operators.RollingDistinct.approx(
        Tables.events(s, d).select(col("ts"), col("user_id")),
        col("ts"), col("user_id"), grain = "day", width = 7,
        lgConfigK = 14, out = "approx_7d")
      .select(col("period").as("wday"), col("approx_7d"))
    val exact = q138RollingDistinct(s, d)
      .select(col("day").as("wday"), col("users_7d"))
    merged.join(exact, "wday")
      .select(col("wday").as("day"), col("users_7d").as("exact_7d"),
        (abs(col("approx_7d") - col("users_7d")) <=
          greatest(col("users_7d") * 0.05, lit(5.0))).as("within_5pct"))
      .orderBy("day")
  }

  val q144Sql: String =
    """WITH du AS (
      |  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
      |days AS (
      |  SELECT DISTINCT date_trunc('day', ts) AS wday FROM events)
      |SELECT d.wday AS day, COUNT(DISTINCT u.user_id) AS exact_7d,
      |  true AS within_5pct
      |FROM days d JOIN du u
      |  ON d.wday BETWEEN u.day AND u.day + INTERVAL 6 DAY
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q145
  // Time-bounded funnel: q137's ordered steps with a 7-day conversion
  // window per step (click within 7 days of the first view, purchase
  // within 7 days of that click) — the form real conversion reporting
  // uses (an eventual purchase a year later is not attribution). Same
  // three keyed aggregates; window arithmetic in exact epoch micros.
  def q145FunnelWindowed(s: SparkSession, d: String): DataFrame = {
    val week = 7L * 86400L * 1000000L
    def ev(t: String) = Tables.events(s, d)
      .where(col("event_type") === t)
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
    val v = ev("view").groupBy("user_id").agg(min("t").as("t1"))
    val c = ev("click").join(v, "user_id")
      .where(col("t") > col("t1") && col("t") <= col("t1") + week)
      .groupBy("user_id").agg(min("t").as("t2"))
    val p = ev("purchase").join(c, "user_id")
      .where(col("t") > col("t2") && col("t") <= col("t2") + week)
      .groupBy("user_id").agg(min("t").as("t3"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(broadcast(c.agg(count(lit(1)).as("n_click"))))
      .crossJoin(broadcast(p.agg(count(lit(1)).as("n_purchase"))))
      .select(lit("view>click>purchase_7d").as("funnel"),
        col("n_view"), col("n_click"), col("n_purchase"),
        round(col("n_click").cast("double") / col("n_view"), 6)
          .as("view_to_click"),
        round(col("n_purchase").cast("double") / col("n_click"), 6)
          .as("click_to_purchase"))
      .orderBy("funnel")
  }

  val q145Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
      |v AS (SELECT user_id, MIN(t) AS t1 FROM e
      |      WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, MIN(e.t) AS t2
      |      FROM e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.t > v.t1
      |        AND e.t <= v.t1 + 604800000000 GROUP BY 1),
      |p AS (SELECT e.user_id, MIN(e.t) AS t3
      |      FROM e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.t > c.t2
      |        AND e.t <= c.t2 + 604800000000 GROUP BY 1)
      |SELECT 'view>click>purchase_7d' AS funnel,
      |  (SELECT COUNT(*) FROM v) AS n_view,
      |  (SELECT COUNT(*) FROM c) AS n_click,
      |  (SELECT COUNT(*) FROM p) AS n_purchase,
      |  ROUND(CAST((SELECT COUNT(*) FROM c) AS DOUBLE)
      |    / (SELECT COUNT(*) FROM v), 6) AS view_to_click,
      |  ROUND(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
      |    / (SELECT COUNT(*) FROM c), 6) AS click_to_purchase
      |ORDER BY funnel""".stripMargin

  // ---------------------------------------------------------------- q146
  // Last-touch marketing attribution with a 7-day lookback: every
  // purchase is attributed to the LAST view by the same user (the
  // backward as-of join — graft.plans.AsOfMergeJoin, the custom
  // LogicalPlan/Strategy/SparkPlan operator) and kept only if that view
  // is within the window; an older view does NOT re-attribute (that is
  // the point of last-touch). Revenue is decimal-routed; so is the mean
  // view-to-buy latency: Spark's Average over BIGINT accumulates in
  // DOUBLE (order-dependent parallel sum), so the delta is summed as
  // DECIMAL(28,0) — exact and order-insensitive — and divided by the
  // non-null count, with the oracle running the identical algebra.
  def q146Attribution(s: SparkSession, d: String): DataFrame = {
    val week = 7L * 86400L * 1000000L
    val purchases = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_us"), col("value"))
    val views = Tables.events(s, d)
      .filter(col("event_type") === "view")
      .select(col("user_id"), unix_micros(col("ts")).as("view_us"))
    graft.plans.AsOfMergeJoin.backward(purchases, views,
        key = "user_id", leftTime = "purchase_us",
        rightTime = "view_us", payload = Seq("view_us"))
      .withColumn("attributed",
        col("view_us").isNotNull &&
          col("purchase_us") - col("view_us") <= week)
      .groupBy("attributed")
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("revenue"),
        round(sum((col("purchase_us") - col("view_us"))
            .cast(DecimalType(28, 0))).cast("double")
          / count(col("purchase_us") - col("view_us"))
          / 3600000000.0, 4)
          .as("avg_latency_hr"))
      .orderBy("attributed")
  }

  val q146Sql: String =
    """WITH p AS (
      |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS purchase_us,
      |    value
      |  FROM events WHERE event_type = 'purchase'),
      |v AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS view_us
      |  FROM events WHERE event_type = 'view'),
      |a AS (
      |  SELECT p.value, p.purchase_us, v.view_us
      |  FROM p ASOF LEFT JOIN v
      |    ON p.user_id = v.user_id AND p.purchase_us >= v.view_us)
      |SELECT (view_us IS NOT NULL
      |    AND purchase_us - view_us <= 604800000000) AS attributed,
      |  COUNT(*) AS n_purchases,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  ROUND(CAST(SUM(CAST(purchase_us - view_us AS DECIMAL(28,0))) AS DOUBLE)
    / COUNT(purchase_us - view_us) / 3600000000.0, 4) AS avg_latency_hr
      |FROM a GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q135_lorenz_deciles"  -> (q135LorenzDeciles _),
    "q136_bm25"            -> (q136Bm25 _),
    "q137_funnel"          -> (q137Funnel _),
    "q138_rolling_distinct" -> (q138RollingDistinct _),
    "q139_retention"       -> (q139Retention _),
    "q140_equidepth_bins"  -> (q140EquidepthBins _),
    "q141_weighted_median" -> (q141WeightedMedian _),
    "q142_streaks"         -> (q142Streaks _),
    "q143_ppjoin"          -> (q143PpJoin _),
    "q144_rolling_hll"     -> (q144RollingHll _),
    "q145_funnel_windowed" -> (q145FunnelWindowed _),
    "q146_attribution"     -> (q146Attribution _))

  val oracles: Map[String, String] = Map(
    "q135_lorenz_deciles"  -> q135Sql,
    "q136_bm25"            -> q136Sql,
    "q137_funnel"          -> q137Sql,
    "q138_rolling_distinct" -> q138Sql,
    "q139_retention"       -> q139Sql,
    "q140_equidepth_bins"  -> q140Sql,
    "q141_weighted_median" -> q141Sql,
    "q142_streaks"         -> q142Sql,
    "q143_ppjoin"          -> q143Sql,
    "q144_rolling_hll"     -> q144Sql,
    "q145_funnel_windowed" -> q145Sql,
    "q146_attribution"     -> q146Sql)
}
