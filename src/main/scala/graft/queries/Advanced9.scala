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

  // ---------------------------------------------------------------- q175
  // Triangle counting by DEGREE-ORDERED ORIENTATION (Suri &
  // Vassilvitskii '11) — the at-scale upgrade of q105's id-ordered
  // 3-way join: q105 enumerates each triangle once at its lowest-ID
  // vertex, which still explodes on a hub whose neighbors mostly have
  // HIGHER ids (C(d, 2) wedges at one reducer). Here each undirected
  // edge is directed from its lower-(degree, id) endpoint, so wedges
  // are enumerated only among higher-RANKED neighbors — every vertex's
  // out-degree is O(sqrt(m)) regardless of its degree, which is what
  // keeps the wedge shuffle bounded on power-law graphs at 10^9 edges.
  // The graph is the q105 ring densified with a hash chord so the
  // census is non-trivial (508 triangles at sf0.01); the oracle counts
  // the SAME triangles with the id-ordered join (any total order counts
  // each exactly once — their equality is itself the cross-check).
  // The edge set and the oriented edge list each materialize ONCE
  // (Lineage.cut): the r17 shape rebuilt them from independent reads
  // per consumer — 16 evaluations of the scan+explode+distinct edge
  // DAG in one 280-operator plan (r19 opt round measurement; guide
  // §4.4's duplicated-subtree rule applied to the JVM plan). After the
  // cut the three wedge consumers read the same blocks, the plan drops
  // to ~40 operators, and the checkpointed frames self-join without
  // tripping AMBIGUOUS_SELF_JOIN (fresh exprIds per aliasing select).
  def q175TriangleCount(s: SparkSession, d: String): DataFrame = {
    val nDf = Tables.documents(s, d).agg(count(lit(1)).as("n"))
    val edges = graft.operators.Lineage.cut(
      Tables.documents(s, d).select(col("doc_id"))
        .crossJoin(broadcast(nDf))
        .select(col("doc_id").as("s"), explode_outer(array(
          (col("doc_id") + 1) % col("n"),
          (col("doc_id") + 2) % col("n"),
          (col("doc_id") * 7 + 13) % col("n"))).as("t"))
        .filter(col("s") =!= col("t"))
        .select(least(col("s"), col("t")).as("a"),
          greatest(col("s"), col("t")).as("b"))
        .distinct())
    def degrees(alias: String): DataFrame = edges
      .select(col("a").as("v")).unionAll(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as(s"deg_$alias"))
      .withColumnRenamed("v", alias)
    // orient a→b edges from the lower (deg, id) rank to the higher; the
    // rank rides as a struct so the wedge condition compares it directly
    val oriented = graft.operators.Lineage.cut(edges
      .join(degrees("a"), "a").join(degrees("b"), "b")
      .select(
        struct(col("deg_a").as("d"), col("a").as("i")).as("ra"),
        struct(col("deg_b").as("d"), col("b").as("i")).as("rb"),
        col("a"), col("b"))
      .select(
        when(col("ra") < col("rb"), col("a")).otherwise(col("b")).as("u"),
        when(col("ra") < col("rb"), col("b")).otherwise(col("a")).as("v"),
        when(col("ra") < col("rb"), col("rb")).otherwise(col("ra")).as("rv")))
    val w1 = oriented.select(col("u").as("wu"), col("v").as("v1"),
      col("rv").as("r1"))
    val w2 = oriented.select(col("u").as("wu"), col("v").as("v2"),
      col("rv").as("r2"))
    val closing = oriented.select(col("u").as("v1"), col("v").as("v2"))
    val triDf = w1.join(w2, Seq("wu")).filter(col("r1") < col("r2"))
      .join(closing, Seq("v1", "v2"))
      .agg(count(lit(1)).as("n_triangles"))
    Tables.documents(s, d).agg(count(lit(1)).as("n_vertices"))
      .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
      .crossJoin(triDf)
  }

  val q175Sql: String =
    """WITH n AS (SELECT COUNT(*) AS n FROM documents),
      |e0 AS (
      |  SELECT doc_id AS s, (doc_id + 1) % n.n AS t FROM documents, n
      |  UNION ALL SELECT doc_id, (doc_id + 2) % n.n FROM documents, n
      |  UNION ALL SELECT doc_id, (doc_id * 7 + 13) % n.n FROM documents, n),
      |e AS (SELECT DISTINCT LEAST(s, t) AS a, GREATEST(s, t) AS b
      |      FROM e0 WHERE s <> t)
      |SELECT (SELECT COUNT(*) FROM documents) AS n_vertices,
      |  (SELECT COUNT(*) FROM e) AS n_edges,
      |  (SELECT COUNT(*) FROM e e1
      |     JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
      |     JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) AS n_triangles""".stripMargin

  // ---------------------------------------------------------------- q176
  // Explicit GROUPING SETS with GROUPING() markers — the general form of
  // which q39's ROLLUP and q40's CUBE are special cases: two 1-D margins
  // plus the grand total in ONE pass (Spark's Expand, one shuffle), with
  // grouping() disambiguating a NULL key from a rolled-up one. Ordering
  // pins NULLS FIRST on the nullable key columns (Spark/DuckDB default
  // divergence rule).
  def q176GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql("""
      SELECT o_orderpriority, o_orderstatus,
        COUNT(*) AS n_orders,
        CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
        CAST(grouping(o_orderstatus) AS BIGINT) AS g_status
      FROM orders_gs
      GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      ORDER BY g_prio, g_status,
        o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""")
  }

  val q176Sql: String =
    """SELECT o_orderpriority, o_orderstatus,
      |  COUNT(*) AS n_orders,
      |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
      |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      |ORDER BY g_prio, g_status,
      |  o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q184
  // Benchmark decontamination — the standard pre-training hygiene step
  // (GPT-3 appendix C / PaLM §7 style): flag corpus documents sharing
  // any word n-gram with an evaluation ("benchmark") set, here the
  // deterministic doc_id % 50 == 0 slice. Output: one row per
  // contaminated corpus doc with its distinct shared-gram count.
  // Production pipelines use 13-grams; this corpus' small vocabulary
  // makes 3 the equivalent selectivity (5-grams flag 1 doc at sf0.01,
  // 3-grams 257 of 490 — measured in DuckDB before picking, per the
  // shingle-rarity rule). The q91 contamination PROFILE measures
  // overlap fractions with benchmark docs still in-corpus; this is the
  // FILTER-stage twin — the eval slice is excluded from the corpus
  // side and any single shared gram flags the document for removal.
  //
  // Scale posture: an eval suite is thousands of documents against a
  // corpus of billions, so the benchmark gram set is DISTINCT'd and
  // BROADCAST — the corpus side never shuffles its grams: tokenize +
  // explode stay map-local, the broadcast hash semi-probe drops
  // non-matching grams in place, and the only exchange is the final
  // partial-agg on doc_id over the (rare) surviving rows. No
  // corpus-vs-corpus or corpus-gram shuffle at any width.
  def q184Decontaminate(s: SparkSession, d: String): DataFrame = {
    import graft.functions.text
    // two independent reads (self-join ambiguity rule)
    val bench = Tables.documents(s, d)
      .filter(pmod(col("doc_id"), lit(50)) === 0)
      // explode_outer: a plain explode of a computed array clones the
      // whole ngram expression into an inferred size() pre-filter
      .select(explode_outer(text.word_ngrams(col("text"), 3)).as("gram"))
      .filter(col("gram").isNotNull)
      .distinct()
    val corpus = Tables.documents(s, d)
      .filter(pmod(col("doc_id"), lit(50)) =!= 0)
      .select(col("doc_id"), col("source"),
        explode_outer(text.word_ngrams(col("text"), 3)).as("gram"))
      .filter(col("gram").isNotNull)
    // word_ngrams is distinct per doc and bench is distinct, so the
    // inner-join row count per doc IS the distinct shared-gram count
    corpus.join(broadcast(bench), Seq("gram"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_shared_grams"))
      .orderBy("doc_id")
  }

  val q184Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, source, regexp_extract_all(text, '\S+') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, source,
      |    list_distinct(list_transform(
      |      range(1, len(toks) - 1),
      |      i -> toks[i] || ' ' || toks[i + 1] || ' ' ||
      |           toks[i + 2])) AS grams
      |  FROM tok WHERE len(toks) >= 3),
      |bench AS (
      |  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 50 = 0),
      |corpus AS (
      |  SELECT doc_id, source, unnest(grams) AS gram
      |  FROM g WHERE doc_id % 50 <> 0)
      |SELECT c.doc_id, c.source, COUNT(*) AS n_shared_grams
      |FROM corpus c JOIN bench b USING (gram)
      |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q190
  // BPE tokenizer TRAINING step (Sennrich et al. '16): three merge
  // rounds of byte-pair encoding learned from the corpus. Words are
  // held as separator-joined symbol strings ("t|h|e"); a merge (a, b)
  // is `replace(rep, "a|b", "ab")` — leftmost non-overlapping in both
  // engines, which IS the BPE application order — so Spark and DuckDB
  // run the identical algorithm and the oracle is exact.
  //
  // Scale posture: pair counting runs over the DISTINCT-WORD table
  // weighted by word frequency (vocab-sized, not corpus-sized — the
  // one corpus-wide pass is the initial word count, map-side
  // combinable). The vocab is materialized ONCE (localCheckpoint, the
  // iterative-loop rule) and each round's argmax is collected and
  // frozen as plan literals (the sketch-freeze rule: a re-evaluated
  // subplan could diverge, a literal cannot). Per round: one
  // vocab-sized aggregate + a driver-side 1-row collect — at 100 TB
  // the corpus pass happens once and the loop runs on megabytes.
  def q190BpeTrain(s: SparkSession, d: String): DataFrame = {
    val vocab = Tables.documents(s, d)
      .select(explode_outer(
        expr("regexp_extract_all(text, '\\\\S+', 0)")).as("wd"))
      .filter(col("wd").isNotNull)
      .groupBy("wd").agg(count(lit(1)).as("f"))
      .select(concat_ws("|", split(col("wd"), "")).as("rep"), col("f"))
      .localCheckpoint(true)
    var cur = vocab
    val merges = Seq.newBuilder[(Int, String, Long)]
    for (i <- 1 to 3) {
      val top = cur
        .select(split(col("rep"), "\\|").as("sym"), col("f"))
        .filter(size(col("sym")) >= 2)
        .select(explode_outer(expr(
          "transform(sequence(0, size(sym) - 2), " +
            "j -> concat(element_at(sym, j + 1), ' ', " +
            "element_at(sym, j + 2)))")).as("pair"), col("f"))
        .filter(col("pair").isNotNull)
        .groupBy("pair").agg(sum("f").as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(1)
        .collect()(0)
      val pair = top.getString(0)
      merges += ((i, pair, top.getLong(1)))
      cur = cur.select(replace(col("rep"),
        lit(pair.replace(" ", "|")), lit(pair.replace(" ", ""))).as("rep"),
        col("f"))
    }
    import s.implicits._
    merges.result().toDF("merge_no", "pair", "freq").orderBy("merge_no")
  }

  val q190Sql: String = {
    def pairsOf(src: String, p: String) =
      s"""$p AS (SELECT pair, SUM(f) AS cnt FROM (
         |    SELECT unnest(list_transform(range(1, len(sym)),
         |      i -> sym[i] || ' ' || sym[i + 1])) AS pair, f
         |    FROM (SELECT string_split(rep, '|') AS sym, f FROM $src))
         |  GROUP BY 1 ORDER BY cnt DESC, pair LIMIT 1)""".stripMargin
    def mergeOf(src: String, p: String, out: String) =
      s"""$out AS (SELECT replace(rep,
         |    replace((SELECT pair FROM $p), ' ', '|'),
         |    replace((SELECT pair FROM $p), ' ', '')) AS rep, f
         |  FROM $src)""".stripMargin
    s"""WITH w AS (
       |  SELECT wd, COUNT(*) AS f FROM (
       |    SELECT unnest(regexp_extract_all(text, '\\S+')) AS wd
       |    FROM documents) GROUP BY 1),
       |s0 AS (SELECT array_to_string(string_split(wd, ''), '|') AS rep,
       |  f FROM w),
       |${pairsOf("s0", "p1")},
       |${mergeOf("s0", "p1", "s1")},
       |${pairsOf("s1", "p2")},
       |${mergeOf("s1", "p2", "s2")},
       |${pairsOf("s2", "p3")}
       |SELECT merge_no, pair, CAST(cnt AS BIGINT) AS freq FROM (
       |  SELECT 1 AS merge_no, pair, cnt FROM p1
       |  UNION ALL SELECT 2, pair, cnt FROM p2
       |  UNION ALL SELECT 3, pair, cnt FROM p3)
       |ORDER BY merge_no""".stripMargin
  }

  // ---------------------------------------------------------------- q194
  // Bigram language-model scoring with add-1 smoothing — the perplexity-
  // proxy quality filter one level up from q120's unigram: per document,
  // the average ln P(w_i | w_{i-1}) where P(b|a) = (cnt(a,b)+1) /
  // (cnt(a)+V). Low scores = token soup unlike the corpus; high =
  // stereotyped boilerplate — both ends get filtered in a real pipeline.
  //
  // Scale posture: the model tables are vocabulary-sized (unigram counts,
  // bigram counts — Heaps-law sublinear in the corpus) and BROADCAST;
  // the corpus side is one pair-explode pass with a map-side-combinable
  // per-doc aggregate. V rides a 1-row broadcast (the q120/q130 scalar
  // fan-out shape — a window-over-everything would funnel the vocab
  // through one task). Pair multiplicity matters, so pairs come from a
  // positional transform, NOT the distinct word_ngrams kernel. Float
  // discipline per q83/q120: per-doc double sum absorbed by round(4).
  def q194BigramLogprob(s: SparkSession, d: String): DataFrame = {
    val toks = expr("regexp_extract_all(text, '\\\\S+', 0)")
    def docPairs(df: DataFrame): DataFrame = df
      .select(col("doc_id"), toks.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), explode_outer(expr(
        "transform(sequence(0, size(t) - 2), j -> struct(" +
          "element_at(t, j + 1) AS a, " +
          "concat(element_at(t, j + 1), ' ', element_at(t, j + 2)) " +
          "AS pair))")).as("p"))
      .filter(col("p").isNotNull)
      .select(col("doc_id"), col("p.a").as("a"), col("p.pair").as("pair"))
    // independent reads for each lineage (self-join ambiguity rule)
    val uniC = Tables.documents(s, d)
      .select(explode_outer(toks).as("term"))
      .filter(col("term").isNotNull)
      .groupBy("term").agg(count(lit(1)).as("cnt1"))
    val bigC = docPairs(Tables.documents(s, d))
      .groupBy("pair").agg(count(lit(1)).as("cnt2"))
    docPairs(Tables.documents(s, d))
      .join(broadcast(bigC), Seq("pair"))
      .join(broadcast(uniC.withColumnRenamed("term", "a")), Seq("a"))
      .crossJoin(broadcast(uniC.select(count(lit(1)).as("v"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(log((col("cnt2") + lit(1)) / (col("cnt1") + col("v")))) /
          count(lit(1)), 4).as("avg_logprob"))
      .orderBy("doc_id")
  }

  val q194Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_extract_all(text, '\S+') AS t
      |  FROM documents),
      |uni AS (
      |  SELECT term, COUNT(*) AS cnt1 FROM (
      |    SELECT unnest(t) AS term FROM tok) GROUP BY 1),
      |vv AS (SELECT COUNT(*) AS v FROM uni),
      |dpp AS (
      |  SELECT doc_id, p['a'] AS a, p['pair'] AS pair FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(t)),
      |      i -> {'a': t[i], 'pair': t[i] || ' ' || t[i + 1]})) AS p
      |    FROM tok WHERE len(t) >= 2)),
      |big AS (SELECT pair, COUNT(*) AS cnt2 FROM dpp GROUP BY 1)
      |SELECT d.doc_id, COUNT(*) AS n_bigrams,
      |  ROUND(SUM(LN((b.cnt2 + 1) / (u.cnt1 + vv.v))) / COUNT(*), 4)
      |    AS avg_logprob
      |FROM dpp d JOIN big b USING (pair)
      |  JOIN uni u ON u.term = d.a CROSS JOIN vv
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q194_bigram_logprob" -> (q194BigramLogprob _),
    "q170_repetition_profile" -> (q170RepetitionProfile _),
    "q175_triangle_count" -> (q175TriangleCount _),
    "q176_grouping_sets" -> (q176GroupingSets _),
    "q184_decontaminate" -> (q184Decontaminate _),
    "q190_bpe_train" -> (q190BpeTrain _))

  val oracles: Map[String, String] = Map(
    "q170_repetition_profile" -> q170Sql,
    "q175_triangle_count" -> q175Sql,
    "q176_grouping_sets" -> q176Sql,
    "q184_decontaminate" -> q184Sql,
    "q190_bpe_train" -> q190Sql,
    "q194_bigram_logprob" -> q194Sql)
}
