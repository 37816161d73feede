package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Corpus-curation operators — the stages between "deduped documents" and
  * "training shards" that q77's end-to-end pipeline composes at a coarse
  * grain, here exposed as first-class, individually-oracled operators:
  * token-budget packing, benchmark-contamination screening, stratified
  * domain sampling, quality binning, unigram domain divergence, and
  * embedding quantization error.
  *
  * House rules apply throughout: integer/decimal-routed aggregates so a
  * 1000-way tree reduction is bit-identical to DuckDB's serial fold;
  * ROUND before any cross-engine float comparison surface; deterministic
  * total ORDER BY; per-language (or per-label) partitioning so every
  * shuffle key matches the natural sharding of a production corpus.
  */
object Curation {

  private def toks: Column = expr("regexp_extract_all(text, '\\\\S+', 0)")

  // ---------------------------------------------------------------- q90
  // Token-budget packing: assign documents, in deterministic order within
  // each language shard, to fixed-budget training bins by global token
  // offset (pack = cumulative-tokens-before / budget). This is the
  // offset-binning packer: O(1) per row after one window sum, no driver
  // state, and bins are reproducible from the (shard, order) alone — the
  // property that matters when 1000 executors pack shards independently.
  // (A first-fit greedy packer trades that determinism for ~budget/2
  // fewer wasted tokens per bin boundary; at 100 TB the window-sum shape
  // is the one that parallelizes, and the boundary doc that straddles two
  // bins is split downstream by the chunker, q35.)
  def q90Pack(s: SparkSession, d: String): DataFrame = {
    val budget = 512
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), size(toks).cast("long").as("n_tok"))
      .withColumn("cum_before", coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("pack_id", (col("cum_before") / budget).cast("long"))
      .groupBy("lang", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("pack_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("lang", "pack_id")
  }

  val q90Sql: String =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |c AS (
      |  -- CAST the window sum back to BIGINT: DuckDB promotes SUM(BIGINT)
      |  -- to HUGEINT, which pandas renders as float64 — the driver's
      |  -- hash gate is dtype-sensitive (same artifact as q77 round 2)
      |  SELECT doc_id, lang, n_tok,
      |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS cum_before
      |  FROM t)
      |SELECT lang, cum_before // 512 AS pack_id, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tok) AS BIGINT) AS pack_tokens, MIN(doc_id) AS first_doc,
      |  MAX(doc_id) AS last_doc
      |FROM c GROUP BY 1, 2 ORDER BY lang, pack_id""".stripMargin

  // ---------------------------------------------------------------- q91
  // Benchmark-contamination screen: the eval set is the last-16-token
  // tail of every 25th document (planted leakage — the mechanism by which
  // real benchmarks leak: excerpts, not whole documents). Every corpus
  // document is scored by how many of its distinct word-8-grams appear in
  // the benchmark gram set. Scale shape: the benchmark side is tiny by
  // definition (eval suites are KBs against a 100 TB corpus) — distinct
  // grams BROADCAST to every executor and the corpus side is one narrow
  // explode + map-side-combined count; the corpus is never shuffled.
  def q91Contamination(s: SparkSession, d: String): DataFrame = {
    import graft.functions.text
    // word_ngrams kernel: one tokenizer pass per row (vs the Catalyst
    // transform chain's n element_at probes + n-1 concats per gram).
    // explode_OUTER everywhere a computed array is exploded:
    // InferFiltersFromGenerate turns a plain explode into a
    // `size(<generator input>) > 0` filter with the WHOLE gram pipeline
    // re-inlined and re-run per row — measured 15x slower at sf0.1
    // (21 s -> 1.5 s with the Catalyst chain). Outer explode infers no
    // filter; the null row an empty array would emit is joined to
    // nothing and aggregated to zero, so semantics are unchanged.
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), toks.as("tk"), col("text"))
    val bench = docs.filter(col("doc_id") % 25 === 0)
      .select(array_join(slice(col("tk"),
        greatest(size(col("tk")) - lit(15), lit(1)), lit(16)), " ").as("tail"))
      .select(explode_outer(text.word_ngrams(col("tail"), 8)).as("gram"))
      .filter(col("gram").isNotNull).distinct()
    val corpus = docs
      .withColumn("grams", text.word_ngrams(col("text"), 8))
      .select(col("doc_id"), explode_outer(col("grams")).as("gram"),
        size(col("grams")).as("n_grams"))
    corpus.join(broadcast(bench.withColumn("hit", lit(1L))), Seq("gram"), "left")
      .groupBy("doc_id")
      .agg(max("n_grams").cast("long").as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
      .filter(col("n_contaminated") > 0)
      .withColumn("frac",
        round(col("n_contaminated") / col("n_grams"), 6))
      .orderBy("doc_id")
  }

  val q91Sql: String =
    """WITH tk AS (
      |  SELECT doc_id, regexp_extract_all(text, '\S+') AS t FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(t) - 6),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
      |        || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' '
      |        || t[i+7])) AS grams
      |  FROM tk),
      |bench AS (
      |  SELECT DISTINCT unnest(list_distinct(list_transform(
      |      range(1, len(tail) - 6),
      |      i -> tail[i] || ' ' || tail[i+1] || ' ' || tail[i+2] || ' ' ||
      |           tail[i+3] || ' ' || tail[i+4] || ' ' || tail[i+5] || ' ' ||
      |           tail[i+6] || ' ' || tail[i+7]))) AS gram
      |  FROM (SELECT list_slice(t, greatest(len(t) - 15, 1), len(t)) AS tail
      |        FROM tk WHERE doc_id % 25 = 0)),
      |bl AS (SELECT list(gram) AS bg FROM bench),
      |scored AS (
      |  -- bench list via CROSS JOIN, not a scalar subquery: DuckDB
      |  -- rewrites list_intersect through a lambda, where subqueries
      |  -- are rejected
      |  SELECT g.doc_id, CAST(len(g.grams) AS BIGINT) AS n_grams,
      |    CAST(len(list_intersect(g.grams, bl.bg)) AS BIGINT)
      |      AS n_contaminated
      |  FROM g CROSS JOIN bl)
      |SELECT doc_id, n_grams, n_contaminated,
      |  ROUND(n_contaminated / n_grams, 6) AS frac
      |FROM scored WHERE n_contaminated > 0 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q92
  // Stratified domain sampling (the "data mixing" stage): per-language
  // keep-rates in permille, applied as a SYSTEMATIC modulo sample
  // (doc_id % 1000 < rate) so the sample is deterministic, resumable, and
  // identical no matter how the corpus is partitioned — properties a
  // random() sample lacks on a cluster. The rates table is cardinality-
  // |domains| and broadcasts; the corpus side is a narrow filter, zero
  // extra shuffles beyond the reporting aggregate.
  def q92StratifiedSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rates = Seq(("en", 500L), ("de", 300L), ("fr", 200L), ("es", 100L),
      ("zh", 50L)).toDF("lang", "permille")
    Tables.documents(s, d)
      .join(broadcast(rates), Seq("lang"), "left")
      .withColumn("permille", coalesce(col("permille"), lit(100L)))
      .withColumn("kept", (col("doc_id") % 1000 < col("permille")).cast("long"))
      .groupBy("lang", "permille")
      .agg(count(lit(1)).as("n_total"), sum("kept").as("n_kept"),
        sum(when(col("kept") === 1, size(toks).cast("long"))
          .otherwise(0L)).as("kept_tokens"))
      .withColumn("achieved_permille",
        round(col("n_kept") * lit(1000.0) / col("n_total"), 3))
      .orderBy("lang")
  }

  val q92Sql: String =
    """WITH rates(lang, permille) AS (
      |  VALUES ('en', CAST(500 AS BIGINT)), ('de', 300), ('fr', 200),
      |         ('es', 100), ('zh', 50)),
      |s AS (
      |  SELECT d.lang, COALESCE(r.permille, 100) AS permille, d.doc_id,
      |    CASE WHEN d.doc_id % 1000 < COALESCE(r.permille, 100)
      |         THEN 1 ELSE 0 END AS kept,
      |    CAST(len(regexp_extract_all(d.text, '\S+')) AS BIGINT) AS n_tok
      |  FROM documents d LEFT JOIN rates r ON d.lang = r.lang)
      |SELECT lang, permille, COUNT(*) AS n_total,
      |  CAST(SUM(kept) AS BIGINT) AS n_kept,
      |  CAST(SUM(CASE WHEN kept = 1 THEN n_tok ELSE 0 END) AS BIGINT)
      |    AS kept_tokens,
      |  ROUND(SUM(kept) * 1000.0 / COUNT(*), 3) AS achieved_permille
      |FROM s GROUP BY 1, 2 ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q93
  // Quality-decile binning: a curriculum/filter stage bins the corpus
  // into score deciles (NTILE semantics over a deterministic order) and
  // reports the per-bin profile a mixing recipe consumes. The score is a
  // pure integer-ratio density (tokens per 1000 chars) so the bin
  // boundaries are bit-identical cross-engine; ties break on doc_id,
  // making the bucket assignment unique. The corpus-wide rank comes from
  // the PARTITIONED two-pass scan (operators.Scan) — a bare
  // NTILE-over-everything window would funnel every document through one
  // task — and NTILE's bucket rule is then pure arithmetic on
  // (rank, n): with n = 10·q + m, the first m buckets hold q+1 rows.
  def q93QualityBins(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        size(toks).cast("long").as("n_tok"))
      .withColumn("score",
        round(col("n_tok") * lit(1000.0) / col("n_chars"), 6))
    val ranked = graft.operators.Scan.withGlobalRowNumber(scored,
      Seq(col("score"), col("doc_id")), "rn", totalOut = Some("n_total"))
    ranked
      .withColumn("decile",
        graft.operators.Scan.ntileBucket(col("rn"), col("n_total"), 10))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"),
        min("score").as("min_score"), max("score").as("max_score"),
        sum("n_tok").as("sum_tokens"),
        round(avg(col("n_chars").cast(DecimalType(18, 2))).cast("double"), 3)
          .as("avg_chars"))
      .orderBy("decile")
  }

  val q93Sql: String =
    """WITH scored AS (
      |  SELECT doc_id, n_chars,
      |    CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
      |    ROUND(len(regexp_extract_all(text, '\S+')) * 1000.0 / n_chars, 6)
      |      AS score
      |  FROM documents),
      |binned AS (
      |  SELECT *, CAST(NTILE(10) OVER (ORDER BY score, doc_id) AS BIGINT)
      |    AS decile
      |  FROM scored)
      |SELECT decile, COUNT(*) AS n, MIN(score) AS min_score,
      |  MAX(score) AS max_score, CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
      |  ROUND(CAST(AVG(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE), 3)
      |    AS avg_chars
      |FROM binned GROUP BY 1 ORDER BY decile""".stripMargin

  // ---------------------------------------------------------------- q94
  // Unigram domain divergence: chi-square distance between each
  // language's unigram distribution and the corpus-global one — the
  // domain-shift diagnostic behind mixing-weight tuning. Deliberately
  // chi-square, not KL: every per-term step is +,-,*,/ (exactly-rounded
  // IEEE, bit-identical in any engine) with no transcendentals, and the
  // rounded per-term contributions are summed as DECIMALs so the
  // 1000-way tree reduction matches DuckDB's serial fold exactly.
  // Shuffle shape: one map-side-combined count per (lang, term), the
  // vocabulary-sized global table broadcasts.
  def q94DomainDivergence(s: SparkSession, d: String): DataFrame = {
    val tokens = Tables.documents(s, d)
      .select(col("lang"), explode(toks).as("term"))
    val perLang = tokens.groupBy("lang", "term").agg(count(lit(1)).as("c_l"))
    // independent re-read: global totals share no lineage with perLang
    // (joining two aggregates of one lineage trips AMBIGUOUS_SELF_JOIN)
    val tokens2 = Tables.documents(s, d)
      .select(explode(toks).as("term"))
    val global = tokens2.groupBy("term").agg(count(lit(1)).as("c_g"))
    val tLang = perLang.groupBy("lang").agg(sum("c_l").as("t_l"))
    val tGlob = global.agg(sum("c_g").as("t_g"))
    val term = perLang
      .join(broadcast(global), "term")
      .join(broadcast(tLang), "lang")
      .crossJoin(broadcast(tGlob))
      .withColumn("p", col("c_l") / col("t_l"))
      .withColumn("q", col("c_g") / col("t_g"))
      .withColumn("contrib",
        round((col("p") - col("q")) * (col("p") - col("q")) / col("q"), 8)
          .cast(DecimalType(28, 10)))
    term.groupBy("lang")
      .agg(count(lit(1)).as("n_terms"),
        round(sum("contrib").cast("double"), 6).as("chi2"))
      .orderBy("lang")
  }

  val q94Sql: String =
    """WITH tokens AS (
      |  SELECT lang, unnest(regexp_extract_all(text, '\S+')) AS term
      |  FROM documents),
      |per_lang AS (
      |  SELECT lang, term, COUNT(*) AS c_l FROM tokens GROUP BY 1, 2),
      |gl AS (
      |  SELECT term, COUNT(*) AS c_g FROM tokens GROUP BY 1),
      |t_lang AS (
      |  SELECT lang, SUM(c_l) AS t_l FROM per_lang GROUP BY 1),
      |t_glob AS (SELECT SUM(c_g) AS t_g FROM gl),
      |probs AS (
      |  SELECT p.lang, p.c_l / CAST(tl.t_l AS DOUBLE) AS p,
      |    g.c_g / CAST(tg.t_g AS DOUBLE) AS q
      |  FROM per_lang p JOIN gl g USING (term)
      |  JOIN t_lang tl USING (lang) CROSS JOIN t_glob tg),
      |contrib AS (
      |  -- (p-q)*(p-q), never POWER(x,2): pow goes through libm and is not
      |  -- guaranteed exactly-rounded, the explicit product is
      |  SELECT lang,
      |    CAST(ROUND((p - q) * (p - q) / q, 8) AS DECIMAL(28,10)) AS contrib
      |  FROM probs)
      |SELECT lang, COUNT(*) AS n_terms,
      |  ROUND(CAST(SUM(contrib) AS DOUBLE), 6) AS chi2
      |FROM contrib GROUP BY 1 ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------- q95
  // Embedding int8 scalar quantization error: per-vector min/max range,
  // 255-level floor quantization, reconstruction, per-vector max absolute
  // error, aggregated per label. The storage-shrink audit every vector
  // corpus runs before committing to int8 shards. All per-element
  // arithmetic is exactly-rounded IEEE on values derived from the same
  // float inputs (floor, not round, for the level so no tie-break
  // semantics are involved); the corpus aggregate is decimal-routed.
  // Zero shuffles before the final per-label aggregate.
  def q95QuantizeError(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("mn", array_min(col("v")))
      .withColumn("mx", array_max(col("v")))
      .withColumn("scale", (col("mx") - col("mn")) / lit(255.0))
      .withColumn("max_err",
        when(col("scale") === 0.0, lit(0.0)).otherwise(
          round(aggregate(
            transform(col("v"), x =>
              abs(x - (col("mn") +
                least(floor((x - col("mn")) / col("scale")), lit(255.0)) *
                  col("scale")))),
            lit(0.0), (acc, e) => greatest(acc, e)), 9)))
    emb.groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("max_err").cast(DecimalType(20, 12))).cast("double") /
          count(lit(1)), 6).as("avg_max_err"),
        max("max_err").as("worst_err"))
      .orderBy("label")
  }

  val q95Sql: String =
    """WITH q AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |    CASE WHEN list_max(v) = list_min(v) THEN 0.0 ELSE
      |      ROUND(list_max(list_transform(v, x ->
      |        abs(x - (list_min(v) +
      |          least(floor((x - list_min(v)) /
      |                      ((list_max(v) - list_min(v)) / 255.0)), 255.0) *
      |          ((list_max(v) - list_min(v)) / 255.0))))), 9)
      |    END AS max_err
      |  FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v
      |        FROM embeddings))
      |SELECT label, COUNT(*) AS n_vecs,
      |  ROUND(CAST(SUM(CAST(max_err AS DECIMAL(20,12))) AS DOUBLE)
      |    / COUNT(*), 6) AS avg_max_err,
      |  MAX(max_err) AS worst_err
      |FROM q GROUP BY 1 ORDER BY label""".stripMargin

  /** The 100 TB path for quality binning — q93's exact global NTILE is
    * the oracle-able REFERENCE semantics, but a single global sort is the
    * wrong plan at corpus scale. This variant computes approximate
    * decile boundaries with the Greenwald-Khanna sketch (one pass,
    * mergeable, driver gets back just `bins-1` doubles) and assigns bins
    * with a narrow codegen'd array scan — zero global sorts, one
    * aggregate for the report. Bin populations are approximately equal
    * (within the sketch's relative error); `CurationSpec` pins the
    * balance against exact NTILE.
    */
  def approxQualityBins(docs: DataFrame, bins: Int = 10,
      relErr: Double = 0.01): DataFrame = {
    val scored = docs
      .select(col("doc_id"), col("n_chars"),
        size(toks).cast("long").as("n_tok"))
      .withColumn("score",
        round(col("n_tok") * lit(1000.0) / col("n_chars"), 6))
    val cuts = scored.stat
      .approxQuantile("score", (1 until bins).map(_.toDouble / bins).toArray,
        relErr)
    val boundaries = array(cuts.map(lit(_)).toIndexedSeq: _*)
    scored
      .withColumn("decile",
        (size(filter(boundaries, b => b < col("score"))) + 1).cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"),
        min("score").as("min_score"), max("score").as("max_score"))
      .orderBy("decile")
  }

  // --------------------------------------------------------------- q100
  // Blocked fuzzy matching (entity resolution): document "titles" (first
  // 24 chars) with planted single-deletion typos (char 12 dropped from
  // every 10th title, marker id -doc_id-1), resolved by the standard
  // two-stage ER shape — BLOCK on a cheap key (first 8 chars), pairwise
  // Levenshtein <= 2 only INSIDE blocks. The block join replaces the
  // O(n²) all-pairs edit-distance scan with per-block work bounded by
  // the same skew-guard discipline as the LSH families (blocks > 512
  // dropped); a planted deletion beyond the block prefix keeps recall 1
  // by construction. Both engines define levenshtein identically, so the
  // whole decision surface is oracle-able.
  def q100FuzzyMatch(s: SparkSession, d: String): DataFrame = {
    def titles(alias: String) = {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 24).as("title"))
      val planted = Tables.documents(s, d)
        .filter(col("doc_id") % 10 === 0)
        .select((-col("doc_id") - 1L).as("doc_id"),
          concat(substring(col("text"), 1, 11),
            substring(col("text"), 13, 12)).as("title"))
      base.unionByName(planted)
        .select(col("doc_id").as(s"id_$alias"),
          col("title").as(s"title_$alias"),
          substring(col("title"), 1, 8).as(s"block_$alias"))
    }
    val blockSizes = titles("c").groupBy("block_c")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= 512)
      .select(col("block_c").as("block"))
    val a = titles("a")
    val b = titles("b")
    a.join(broadcast(blockSizes), col("block_a") === col("block"))
      .join(b, col("block_a") === col("block_b") && col("id_a") < col("id_b"))
      .withColumn("lev",
        levenshtein(col("title_a"), col("title_b")).cast("long"))
      .filter(col("lev") <= 2)
      .select("id_a", "id_b", "lev")
      .orderBy("id_a", "id_b")
  }

  val q100Sql: String =
    """WITH t AS (
      |  SELECT doc_id, substr(text, 1, 24) AS title FROM documents
      |  UNION ALL
      |  SELECT -doc_id - 1,
      |    substr(text, 1, 11) || substr(text, 13, 12)
      |  FROM documents WHERE doc_id % 10 = 0),
      |k AS (
      |  SELECT doc_id, title, substr(title, 1, 8) AS block FROM t),
      |ok AS (
      |  SELECT block FROM k GROUP BY 1 HAVING COUNT(*) <= 512)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  levenshtein(a.title, b.title) AS lev
      |FROM k a JOIN ok USING (block)
      |JOIN k b ON a.block = b.block AND a.doc_id < b.doc_id
      |WHERE levenshtein(a.title, b.title) <= 2
      |ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------------------------- q179
  // Model-based quality scoring, fasttext-shaped: a LINEAR classifier
  // over HASHED bag-of-words features — token → md5 bucket (mod 512),
  // bucket → integer weight in [-16, 15] derived from a second md5 of
  // the bucket id (a stand-in for a trained weight table with the same
  // compute shape), document score = Σ per-occurrence weights, keep =
  // score > 0. This is the production filtering pattern (fasttext
  // quality classifiers over hashed n-grams) with the ENTIRE feature
  // pipeline in exact integer arithmetic, so the per-language keep
  // accounting hash-oracles bit-for-bit: md5_lower64 is DuckDB's
  // md5_number_lower (the q23/q27 kernel pattern — use md5 when you
  // need a cross-engine oracle, FNV when you need throughput).
  // Shape: one tokenize pass, map-side-combined (doc, lang) partial
  // sums, then a tiny per-language rollup — two shuffles, the first on
  // the natural doc grain.
  def q179LinearQuality(s: SparkSession, d: String): DataFrame = {
    val B = 512
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode_outer(toks).as("token"))
      .filter(col("token").isNotNull)
    import graft.functions.matching.md5_lower64
    // POWER-OF-TWO moduli only: DuckDB's md5_number_lower is unsigned,
    // Spark's long is signed — pmod(signed, 2^k) == unsigned % 2^k (the
    // q127 congruence); any other modulus diverges (cost a red gate run)
    val bucket = pmod(md5_lower64(col("token")), lit(B.toLong))
    val weight = pmod(md5_lower64(concat(lit("w:"),
      bucket.cast("string"))), lit(32L)) - 16L
    val perDoc = tok
      .select(col("doc_id"), col("lang"), weight.as("w"))
      .groupBy("doc_id", "lang")
      .agg(sum("w").as("score"), count(lit(1)).as("n_tok"))
    perDoc.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_keep"),
        sum("score").as("total_score"),
        sum("n_tok").as("total_tokens"))
      .orderBy("lang")
  }

  val q179Sql: String =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    unnest(regexp_extract_all(text, '\S+')) AS token
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, lang,
      |    CAST(md5_number_lower('w:' ||
      |      CAST(md5_number_lower(token) % 512 AS VARCHAR)) % 32
      |      AS BIGINT) - 16 AS w
      |  FROM t),
      |ds AS (
      |  SELECT doc_id, lang, CAST(SUM(w) AS BIGINT) AS score,
      |    COUNT(*) AS n_tok
      |  FROM w GROUP BY 1, 2)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_keep,
      |  CAST(SUM(score) AS BIGINT) AS total_score,
      |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens
      |FROM ds GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q179_linear_quality"  -> (q179LinearQuality _),
    "q90_pack"            -> (q90Pack _),
    "q91_contamination"   -> (q91Contamination _),
    "q92_stratified"      -> (q92StratifiedSample _),
    "q93_quality_bins"    -> (q93QualityBins _),
    "q94_domain_div"      -> (q94DomainDivergence _),
    "q95_quantize_err"    -> (q95QuantizeError _),
    "q100_fuzzy_match"    -> (q100FuzzyMatch _))

  val oracles: Map[String, String] = Map(
    "q179_linear_quality"  -> q179Sql,
    "q90_pack"            -> q90Sql,
    "q91_contamination"   -> q91Sql,
    "q92_stratified"      -> q92Sql,
    "q93_quality_bins"    -> q93Sql,
    "q94_domain_div"      -> q94Sql,
    "q95_quantize_err"    -> q95Sql,
    "q100_fuzzy_match"    -> q100Sql)
}
