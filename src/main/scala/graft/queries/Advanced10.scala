package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-13 training-pipeline additions — the three steps between a
  * trained tokenizer and a training run: ENCODE the corpus with the
  * learned merges (q198), SAMPLE the domain mixture deterministically
  * (q199), and PACK documents into fixed-length training sequences
  * (q200). Each is the Spark-first shape of the corresponding 100 TB
  * job: vocabulary-sized broadcasts, hash-derived sampling decisions
  * (no RNG state, reproducible across reruns and engines), and the
  * two-phase distributed prefix scan instead of a single-partition
  * window.
  */
object Advanced10 {

  // ---------------------------------------------------------------- q198
  // BPE ENCODE: q190 learns the merge table; this applies it. The three
  // merges are learned exactly as q190 does (same loop, argmaxes frozen
  // as plan literals), the final per-word symbol table is
  // vocabulary-sized and BROADCAST onto one corpus word-explode pass,
  // and the output is the per-language token accounting a tokenizer
  // rollout report needs (words, post-merge tokens). At 100 TB the
  // corpus side stays one narrow pass; the join side is O(vocab) —
  // the same posture as q194's LM scoring.
  def q198BpeEncode(s: SparkSession, d: String): DataFrame = {
    val vocab = Tables.documents(s, d)
      .select(explode_outer(
        expr("regexp_extract_all(text, '\\\\S+', 0)")).as("wd"))
      .filter(col("wd").isNotNull)
      .groupBy("wd").agg(count(lit(1)).as("f"))
      .select(concat_ws("|", split(col("wd"), "")).as("rep"), col("f"))
      .localCheckpoint(true)
    var cur = vocab
    for (_ <- 1 to 3) {
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
      cur = cur.select(replace(col("rep"),
        lit(pair.replace(" ", "|")), lit(pair.replace(" ", ""))).as("rep"),
        col("f"))
    }
    // the encoder table: word -> its post-merge token count (the word
    // reconstructs from the rep by dropping separators — '|' never
    // appears in corpus words)
    val encoder = cur.select(
      replace(col("rep"), lit("|"), lit("")).as("wd"),
      size(split(col("rep"), "\\|")).cast("long").as("tok"))
    val docWords = Tables.documents(s, d)
      .select(col("lang"), explode_outer(
        expr("regexp_extract_all(text, '\\\\S+', 0)")).as("wd"))
      .filter(col("wd").isNotNull)
    docWords.join(broadcast(encoder), Seq("wd"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum("tok").cast("long").as("n_tokens"))
      .orderBy("lang")
  }

  /** The q190 merge derivation (s0→s3 CTE chain) extended by the encode
    * join: every corpus word is in the vocabulary by construction, so
    * the inner join loses nothing.
    */
  val q198Sql: String = {
    def pairsOf(src: String, p: String) =
      s"""$p AS (SELECT pair FROM (
         |    SELECT unnest(list_transform(range(1, len(sym)),
         |      i -> sym[i] || ' ' || sym[i + 1])) AS pair, f
         |    FROM (SELECT string_split(rep, '|') AS sym, f FROM $src))
         |  GROUP BY pair ORDER BY SUM(f) DESC, pair LIMIT 1)""".stripMargin
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
       |${pairsOf("s2", "p3")},
       |${mergeOf("s2", "p3", "s3")},
       |enc AS (SELECT replace(rep, '|', '') AS wd,
       |  len(string_split(rep, '|')) AS tok FROM s3),
       |dw AS (SELECT lang, unnest(regexp_extract_all(text, '\\S+')) AS wd
       |  FROM documents)
       |SELECT lang, COUNT(*) AS n_words,
       |  CAST(SUM(tok) AS BIGINT) AS n_tokens
       |FROM dw JOIN enc USING (wd)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ---------------------------------------------------------------- q199
  // Deterministic domain-mixture sampling: the data-mixing step of a
  // training pipeline — hot sources kept whole, the long tail
  // downsampled to 25% — decided per document by a HASH of its id, not
  // an RNG: reproducible across reruns, engines, and partitionings, and
  // joinable later (the same hash re-derives the decision anywhere).
  // md5-parameterized so DuckDB recomputes it bit-for-bit; the modulus
  // is a POWER OF TWO via pmod (the q179 signed/unsigned congruence
  // rule). Row-local decision — no shuffle beyond the final aggregate.
  def q199MixtureSample(s: SparkSession, d: String): DataFrame = {
    val hot = Seq("src0", "src1", "src2", "src3")
    val h = pmod(graft.functions.matching.md5_lower64(
      concat(lit("mix:"), col("doc_id").cast("string"))), lit(1024L))
    val cap = when(col("source").isin(hot: _*), 1024L).otherwise(256L)
    Tables.documents(s, d)
      .select(col("source"), col("n_chars"), h.as("h"), cap.as("cap"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("h") < col("cap"), 1)).as("n_kept"),
        sum(when(col("h") < col("cap"), col("n_chars")))
          .cast("long").as("kept_chars"))
      .orderBy("source")
  }

  val q199Sql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  COUNT(CASE WHEN md5_number_lower('mix:' || CAST(doc_id AS VARCHAR))
      |      % 1024 < (CASE WHEN source IN ('src0','src1','src2','src3')
      |      THEN 1024 ELSE 256 END) THEN 1 END) AS n_kept,
      |  CAST(SUM(CASE WHEN md5_number_lower('mix:' ||
      |      CAST(doc_id AS VARCHAR)) % 1024 <
      |      (CASE WHEN source IN ('src0','src1','src2','src3')
      |      THEN 1024 ELSE 256 END) THEN n_chars END) AS BIGINT)
      |    AS kept_chars
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q200
  // Sequence packing: documents concatenated in doc_id order and cut
  // into fixed 2048-token training sequences (token proxy:
  // n_chars div 4 + 1); each document reports to the sequence where it
  // STARTS. The per-doc start offset is an EXCLUSIVE distributed
  // prefix sum over the global order — `operators/Scan`'s two-phase
  // scan (range-bucketed local windows + a broadcast carry-in), the
  // q135/q141 machinery, NOT a single-partition window (PlanShapeSpec's
  // blanket guard). Per-sequence doc/token accounting is the packing
  // efficiency report a dataloader build emits.
  def q200SeqPack(s: SparkSession, d: String): DataFrame = {
    val t = Tables.documents(s, d)
      .select(col("doc_id"), expr("n_chars div 4 + 1").as("tok"))
    graft.operators.Scan
      .withRunningSum(t, Seq(col("doc_id")), col("tok"), "off")
      .select(col("tok"),
        coalesce(col("off"), lit(0L)).as("off"))
      .select(expr("off div 2048").as("seq_id"), col("tok"))
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("tok").cast("long").as("n_tokens"))
      .orderBy("seq_id")
  }

  val q200Sql: String =
    """WITH t AS (
      |  SELECT doc_id, n_chars // 4 + 1 AS tok FROM documents),
      |o AS (
      |  SELECT tok, COALESCE(CAST(SUM(tok) OVER (ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |    0) AS off
      |  FROM t)
      |SELECT off // 2048 AS seq_id, COUNT(*) AS n_docs,
      |  CAST(SUM(tok) AS BIGINT) AS n_tokens
      |FROM o GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q198_bpe_encode" -> (q198BpeEncode _),
    "q199_mixture_sample" -> (q199MixtureSample _),
    "q200_seq_pack" -> (q200SeqPack _))

  val oracles: Map[String, String] = Map(
    "q198_bpe_encode" -> q198Sql,
    "q199_mixture_sample" -> q199Sql,
    "q200_seq_pack" -> q200Sql)
}
