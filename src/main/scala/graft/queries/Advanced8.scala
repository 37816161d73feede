package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.vectors

/** Round-7 additions: PII redaction and semantic (embedding-space)
  * dedup — two training-data-pipeline components the curation family
  * did not yet cover.
  */
object Advanced8 {

  // ---------------------------------------------------------------- q147
  // PII detection + redaction — the compliance pass every LLM training
  // corpus runs before anything else. The synthetic tables carry no raw
  // PII, so the profile text is FORMATTED deterministically from
  // customer columns inside the query (email + phone derived from
  // c_custkey — a pure function of the input, so the oracle rebuilds the
  // identical corpus), then the real redaction stack runs over it:
  // sequential regex passes (emails -> phones -> long digit runs), each
  // COUNTED on the text as left by the previous pass so overlapping
  // classes (digits inside an email) are never double-counted. The regex
  // surface is the RE2/Java-regex intersection (\b, \d, bounded
  // repetition — no lookbehind), so Spark and DuckDB replace
  // identically. Scale posture: a single narrow codegen projection —
  // ZERO shuffles; the orderBy is presentation-only.
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "\\b\\d{3}-\\d{4}\\b"
  private val NumRe = "\\d{5,}"

  def q147PiiRedaction(s: SparkSession, d: String): DataFrame = {
    val profile = Tables.customer(s, d).select(col("c_custkey"),
      concat(lit("name: "), col("c_name"),
        lit(" contact: user"), col("c_custkey"), lit("@example.com"),
        lit(" tel "),
        format_string("%03d-%04d",
          pmod(col("c_custkey") * 7, lit(1000)),
          pmod(col("c_custkey") * 13, lit(10000))),
        lit(" segment "), col("c_mktsegment")).as("text"))
    profile
      .withColumn("n_email",
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long"))
      .withColumn("t1", regexp_replace(col("text"), EmailRe, "<EMAIL>"))
      .withColumn("n_phone",
        size(regexp_extract_all(col("t1"), lit(PhoneRe), lit(0))).cast("long"))
      .withColumn("t2", regexp_replace(col("t1"), PhoneRe, "<PHONE>"))
      .withColumn("n_num",
        size(regexp_extract_all(col("t2"), lit(NumRe), lit(0))).cast("long"))
      .withColumn("redacted", regexp_replace(col("t2"), NumRe, "<NUM>"))
      .select(col("c_custkey"), col("n_email"), col("n_phone"), col("n_num"),
        col("redacted"))
      .orderBy("c_custkey")
  }

  val q147Sql: String =
    """WITH profile AS (
      |  SELECT c_custkey,
      |    'name: ' || c_name || ' contact: user' || c_custkey ||
      |    '@example.com tel ' ||
      |    printf('%03d-%04d', (c_custkey * 7) % 1000,
      |                        (c_custkey * 13) % 10000) ||
      |    ' segment ' || c_mktsegment AS text
      |  FROM customer),
      |r1 AS (
      |  SELECT c_custkey, text,
      |    CAST(len(regexp_extract_all(text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
      |      AS n_email,
      |    regexp_replace(text,
      |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')
      |      AS t1
      |  FROM profile),
      |r2 AS (
      |  SELECT c_custkey, n_email,
      |    CAST(len(regexp_extract_all(t1, '\b\d{3}-\d{4}\b')) AS BIGINT)
      |      AS n_phone,
      |    regexp_replace(t1, '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS t2
      |  FROM r1)
      |SELECT c_custkey, n_email, n_phone,
      |  CAST(len(regexp_extract_all(t2, '\d{5,}')) AS BIGINT) AS n_num,
      |  regexp_replace(t2, '\d{5,}', '<NUM>', 'g') AS redacted
      |FROM r2 ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q148
  // Semantic dedup (SemDeDup, Abbas et al. '23): cluster the embedding
  // space with q29's frozen two-level IVF model (fixed-k lowest-md5
  // centroids as plan literals; hot cells sub-clustered — see
  // similarity/Knn), enumerate pairs ONLY within a (cid, scid) cell, and
  // drop every vector that is cosine-similar to a lower-id vector of its
  // cell — the keep-one-representative policy. Pairing is bounded by
  // SUB-cell size (never corpus-wide, and since r8 never by a cell that
  // grew with the corpus: the old vec_id % 97 centroid rule scaled the
  // broadcast side linearly and was the one flagged scale-killer). The
  // synthetic embeddings are isotropic-random (max pairwise cosine
  // ~0.51), so the threshold 0.3 is chosen to exercise the policy on
  // this corpus; on a real near-dup corpus it sits at ~0.95+ — the
  // machinery is threshold-independent. The oracle restates the
  // deterministic plan itself (q29's pattern): the shared ivfSqlPrologue
  // model, in-cell pairs, same 6-dp rounded cosine on both sides.
  def q148SemanticDedup(s: SparkSession, d: String): DataFrame = {
    val threshold = 0.3
    val m = graft.similarity.Knn.fitIvf(
      Tables.embeddings(s, d).select(col("vec_id"), col("embedding")))
    // two independent reads keep the self-join unambiguous (CLAUDE rule);
    // the frozen literal model assigns both sides identically
    def assigned() = graft.similarity.Knn.assignCorpus(
      Tables.embeddings(s, d).select(col("vec_id"), col("embedding")), m)
    val a = assigned().select(col("cid"), col("scid"),
      col("vec_id").as("i"), col("embedding").as("vi"))
    val b = assigned().select(col("cid"), col("scid"),
      col("vec_id").as("j"), col("embedding").as("vj"))
    a.join(b, Seq("cid", "scid")).filter(col("i") < col("j"))
      .withColumn("cs",
        round(vectors.cosine_similarity(col("vi"), col("vj")), 6))
      .filter(col("cs") >= threshold)
      .groupBy(col("cid"), col("j").as("vec_id"))
      .agg(count(lit(1)).as("n_dups"), min("i").as("dup_of"),
        max("cs").as("max_sim"))
      .orderBy("vec_id")
  }

  val q148Sql: String =
    s"""WITH ${graft.similarity.Knn.ivfSqlPrologue},
       |p AS (
       |  SELECT x.cid, x.vec_id AS i, y.vec_id AS j,
       |    ROUND(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
       |                                 CAST(y.embedding AS DOUBLE[])), 6) AS cs
       |  FROM corpus_assign x JOIN corpus_assign y
       |    ON x.cid = y.cid AND x.scid = y.scid AND x.vec_id < y.vec_id)
       |SELECT cid, j AS vec_id, COUNT(*) AS n_dups, MIN(i) AS dup_of,
       |  MAX(cs) AS max_sim
       |FROM p WHERE cs >= 0.3
       |GROUP BY 1, 2 ORDER BY vec_id""".stripMargin

  // ---------------------------------------------------------------- q149
  // Character n-gram Jaccard near-dup join — the shingle-level dedup
  // flavor (robust to word-boundary edits where q143's word tokens are
  // not), on the SAME operators.SetSimJoin machinery at t = 19/20: the
  // operator takes the threshold as an exact rational, so the whole
  // filter stack reparameterizes without touching the query. (At
  // t = 0.9 the prefix grows to ~10% of each ~200-shingle set and even
  // rare shingles here have high document frequency — the candidate
  // join explodes, measured 38 s at sf0.1 vs ~8 s at 19/20 for the
  // IDENTICAL result set; prefix filtering earns its keep at high
  // thresholds, which is where exact near-dup joins run anyway.) 3-grams
  // are built with a narrow higher-order transform (no explode of a
  // computed array; the one explode runs inside the operator's
  // materialized prefix stage). Shingle length 5: on this small-vocab
  // corpus 3-grams are near-universal (mean pairwise J = 0.44 — weak
  // prefix selectivity, measured 6x slower), while 5-grams drop mean J
  // to 0.17 with the SAME true-pair set. Oracle = the brute-force
  // all-pairs definition over identically-built shingle sets.
  def q149NgramJaccard(s: SparkSession, d: String): DataFrame = {
    // the shingle projection is the expensive stage here, and the
    // operator consumes its input four times — so tokenize ONCE with the
    // native char_shingles codegen kernel (the higher-order
    // transform+array_distinct composition costs ~3 s per evaluation at
    // sf0.1; the kernel is a single substring+HashSet sweep) and hand
    // SetSimJoin a factory returning the materialized table. Lineage.cut
    // keeps the scale story: executor memory at bench SF, reliable
    // checkpoint dir on a cluster. No array_sort: set intersection/union
    // sizes are order-invariant.
    // int64 token domain (char_shingles_md5): identical gram extraction,
    // each gram hashed to md5_number_lower — the prefix AND verify stages
    // then shuffle primitive longs instead of 5-char strings (the verify
    // was the bench's top cost moving array<string> both ways). DuckDB
    // recomputes the exact domain, so the oracle stays a full hash
    // compare; SetSimJoinSpec certifies the hashed pair set equals the
    // string-domain pair set.
    val grams = graft.operators.Lineage.cut(
      Tables.documents(s, d).select(col("doc_id"), col("lang"),
        graft.functions.text.char_shingles_md5(col("text"), 5).as("g")))
    graft.operators.SetSimJoin.selfJoin(
        () => grams, "doc_id", "lang", "g", tNum = 19, tDen = 20)
      .orderBy("ia", "ib")
  }

  val q149Sql: String =
    """WITH d AS (
      |  SELECT doc_id, lang,
      |    list_distinct(list_transform(CASE WHEN len(text) >= 5
      |      THEN list_transform(range(1, len(text) - 3), i -> text[i:i+4])
      |      ELSE [] END, s -> md5_number_lower(s))) AS g
      |  FROM documents)
      |SELECT a.doc_id AS ia, b.doc_id AS ib,
      |  ROUND(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.g, b.g))), 6) AS jaccard
      |FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
      |  AND len(a.g) > 0 AND len(b.g) > 0
      |WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |    / len(list_distinct(list_concat(a.g, b.g))) >= 0.95
      |ORDER BY ia, ib""".stripMargin

  // ---------------------------------------------------------------- q151
  // Gopher/C4-style quality-rule gate — the canonical pre-training
  // document filter (Rae et al. '21 heuristics, reduced to the rules
  // this corpus can violate): word-count floor, mean-word-length band,
  // and a distinct-stopword floor. Thresholds are calibrated to the
  // corpus (wc p25=32, mwl p05=4.17, stopwords p25=1) so every rule has
  // real failures. All predicates are exact integer/identical-double
  // arithmetic on single-spaced text, so the DuckDB oracle evaluates the
  // same rules bit-identically. Scale posture: one narrow codegen pass
  // plus a lang-keyed aggregate — nothing corpus-wide.
  def q151QualityGate(s: SparkSession, d: String): DataFrame = {
    val stop = array(Seq("the", "a", "and", "of", "to", "with", "that",
      "for").map(lit): _*)
    Tables.documents(s, d)
      .select(col("lang"),
        size(split(col("text"), " ")).as("wc"),
        (length(expr("replace(text, ' ', '')")).cast("double") /
          size(split(col("text"), " "))).as("mwl"),
        size(array_intersect(array_distinct(split(col("text"), " ")), stop))
          .as("sw"))
      .select(col("lang"),
        (col("wc") >= 30).as("ok_wc"),
        (col("mwl") >= 4.3 && col("mwl") <= 10.0).as("ok_mwl"),
        (col("sw") >= 2).as("ok_sw"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("ok_wc") && col("ok_mwl") && col("ok_sw"), 1))
          .as("n_kept"),
        count(when(!col("ok_wc"), 1)).as("n_fail_wordcount"),
        count(when(!col("ok_mwl"), 1)).as("n_fail_wordlen"),
        count(when(!col("ok_sw"), 1)).as("n_fail_stopwords"))
      .orderBy("lang")
  }

  val q151Sql: String =
    """WITH w AS (
      |  SELECT lang,
      |    len(string_split(text, ' ')) AS wc,
      |    CAST(len(replace(text, ' ', '')) AS DOUBLE)
      |      / len(string_split(text, ' ')) AS mwl,
      |    len(list_intersect(list_distinct(string_split(text, ' ')),
      |        ['the','a','and','of','to','with','that','for'])) AS sw
      |  FROM documents),
      |r AS (
      |  SELECT lang, wc >= 30 AS ok_wc,
      |    mwl >= 4.3 AND mwl <= 10.0 AS ok_mwl, sw >= 2 AS ok_sw
      |  FROM w)
      |SELECT lang, COUNT(*) AS n_docs,
      |  COUNT(CASE WHEN ok_wc AND ok_mwl AND ok_sw THEN 1 END) AS n_kept,
      |  COUNT(CASE WHEN NOT ok_wc THEN 1 END) AS n_fail_wordcount,
      |  COUNT(CASE WHEN NOT ok_mwl THEN 1 END) AS n_fail_wordlen,
      |  COUNT(CASE WHEN NOT ok_sw THEN 1 END) AS n_fail_stopwords
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q147_pii_redaction"  -> (q147PiiRedaction _),
    "q148_semantic_dedup" -> (q148SemanticDedup _),
    "q149_ngram_jaccard"  -> (q149NgramJaccard _),
    "q151_quality_gate"   -> (q151QualityGate _))

  val oracles: Map[String, String] = Map(
    "q147_pii_redaction"  -> q147Sql,
    "q148_semantic_dedup" -> q148Sql,
    "q149_ngram_jaccard"  -> q149Sql,
    "q151_quality_gate"   -> q151Sql)
}
