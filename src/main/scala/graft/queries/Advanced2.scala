package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Round-5 batch 2 (q116-q120): training-mixture weighting, sequence-
  * length bucketing, inverted-index build, Bloom-pruned join reduction,
  * and unigram-LM log-probability quality scoring.
  */
object Advanced2 {

  // ---------------------------------------------------------------- q116
  // Temperature-scaled domain mixture weights (the multinomial sampling
  // schedule multilingual/multi-domain training uses — α = 0.5 here, the
  // mBERT/XLM-R exponent): per-source mass, w ∝ mass^α, expected epochs =
  // weight · total / mass. sqrt is IEEE-correctly-rounded (identical
  // cross-engine), the raw weights are quantized to DECIMAL(18,6) so the
  // normalizing sum is exact and order-insensitive, and the remaining
  // arithmetic is double on identical inputs. One aggregate + one 20-row
  // window — the fact side is scanned once at any scale.
  def q116MixtureWeights(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(lit(1))
    Tables.documents(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("mass"))
      .withColumn("wq", sqrt(col("mass").cast("double")).cast(DecimalType(18, 6)))
      .withColumn("wsum", sum(col("wq")).over(w).cast("double"))
      .withColumn("tot", sum(col("mass")).over(w))
      .select(col("source"), col("n_docs"), col("mass"),
        round(col("wq").cast("double") / col("wsum"), 6).as("weight"),
        round(col("wq").cast("double") / col("wsum") * col("tot") / col("mass"), 6)
          .as("epochs"))
      .orderBy("source")
  }

  val q116Sql: String =
    """WITH m AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(n_chars) AS BIGINT) AS mass
      |  FROM documents GROUP BY 1),
      |q AS (
      |  SELECT source, n_docs, mass,
      |    CAST(sqrt(CAST(mass AS DOUBLE)) AS DECIMAL(18,6)) AS wq,
      |    CAST(SUM(CAST(sqrt(CAST(mass AS DOUBLE)) AS DECIMAL(18,6))) OVER ()
      |      AS DOUBLE) AS wsum,
      |    SUM(mass) OVER () AS tot
      |  FROM m)
      |SELECT source, n_docs, mass,
      |  ROUND(CAST(wq AS DOUBLE) / wsum, 6) AS weight,
      |  ROUND(CAST(wq AS DOUBLE) / wsum * tot / mass, 6) AS epochs
      |FROM q ORDER BY source""".stripMargin

  // ---------------------------------------------------------------- q117
  // Sequence-length bucketing (dynamic-batching prep): documents binned
  // to fixed pad-to boundaries, per-bucket padding waste and utilization
  // — the accounting that decides a training run's effective-token rate.
  // Pure integer CASE binning (no log2 — exact at boundaries by
  // construction), one hash-aggregate.
  def q117LengthBuckets(s: SparkSession, d: String): DataFrame = {
    val bucket = when(col("n_chars") <= 64, 64L)
      .when(col("n_chars") <= 128, 128L)
      .when(col("n_chars") <= 256, 256L)
      .when(col("n_chars") <= 512, 512L)
      .otherwise(1024L)
    Tables.documents(s, d)
      .select(bucket.as("bucket"), col("n_chars"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        sum(col("bucket") - col("n_chars")).as("padding_waste"))
      .withColumn("utilization",
        round(col("sum_chars").cast("double") /
          (col("bucket") * col("n_docs")), 6))
      .orderBy("bucket")
  }

  val q117Sql: String =
    """WITH b AS (
      |  SELECT CASE WHEN n_chars <= 64 THEN 64
      |              WHEN n_chars <= 128 THEN 128
      |              WHEN n_chars <= 256 THEN 256
      |              WHEN n_chars <= 512 THEN 512
      |              ELSE 1024 END AS bucket, n_chars
      |  FROM documents)
      |SELECT bucket, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(SUM(bucket - n_chars) AS BIGINT) AS padding_waste,
      |  ROUND(CAST(SUM(n_chars) AS BIGINT) / CAST(bucket * COUNT(*) AS DOUBLE), 6)
      |    AS utilization
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q118
  // Inverted-index build: term → (document frequency, collection
  // frequency, head of the sorted posting list). THE retrieval-side
  // layout job: one shuffle keyed on the term with map-side combine;
  // posting lists shard by term, never by document, so a 100 TB corpus
  // builds its index with the same single exchange. collect_set + sort
  // keeps the posting head deterministic under any partitioning.
  def q118InvertedIndex(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(text, '\\\\S+', 0)")).as("term"))
      .groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("cf"),
        expr("array_join(slice(array_sort(collect_set(doc_id)), 1, 5), ',')")
          .as("postings_head"))
      .orderBy("term")
  }

  val q118Sql: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
      |  FROM documents)
      |SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS cf,
      |  array_to_string(list_slice(list_sort(list(DISTINCT doc_id)), 1, 5), ',')
      |    AS postings_head
      |FROM t GROUP BY term ORDER BY term""".stripMargin

  // ---------------------------------------------------------------- q119
  // Bloom-pruned join reduction: the selective dimension's key set is
  // compressed into a Bloom filter (distributed build over xxhash64,
  // q88's codegen probe — no UDF boxing) and applied to the fact scan
  // BEFORE the join shuffle, so ~99% of fact rows never enter the
  // exchange; the exact equi-join then removes the filter's false
  // positives. This is the manual form of runtime semi-join filtering —
  // version-robust and explicitly sized — and the single biggest shuffle
  // lever on selective star joins at 100 TB. The oracle is the plain
  // join (bloom has no false negatives ⇒ identical results).
  def q119BloomPrune(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.orders(s, d)
      .filter(col("o_custkey") < 100)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val pruned = Tables.lineitem(s, d)
      .select("l_orderkey", "l_quantity")
      .filter(graft.dedup.Dedup.bloomProbe(s,
        dim.select(col("o_orderkey").as("l_orderkey")), col("l_orderkey")))
    pruned.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("qty"))
      .orderBy("o_orderpriority")
  }

  val q119Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_custkey < 100
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q120
  // Unigram language-model log-probability scoring — the cheap
  // perplexity-proxy quality filter (low average token logprob = rare-
  // token soup; high = stereotyped boilerplate): corpus term counts make
  // the LM (vocabulary-sized → broadcast), each document averages its
  // tokens' ln(cnt/T). Follows q83's cross-engine float discipline: the
  // per-doc sum is double in arbitrary order, absorbed by round(4).
  // The corpus total T rides a 1-row broadcast attach (q130's scalar
  // fan-out shape) — a window-over-everything on the TERM table would
  // funnel the whole vocabulary (Heaps-law unbounded) through one task.
  def q120UnigramLogprob(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .select(explode(expr("regexp_extract_all(text, '\\\\S+', 0)")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val vocab = counts
      .crossJoin(broadcast(counts.select(sum("cnt").as("t"))))
      .select(col("term"), log(col("cnt").cast("double") / col("t")).as("logp"))
    Tables.documents(s, d) // independent read for the token side
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(text, '\\\\S+', 0)")).as("term"))
      .join(broadcast(vocab), Seq("term"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("logp")) / count(lit(1)), 4).as("avg_logprob"))
      .orderBy("doc_id")
  }

  val q120Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
      |  FROM documents),
      |vocab AS (
      |  SELECT term, LN(CAST(COUNT(*) AS DOUBLE) /
      |    (SUM(COUNT(*)) OVER ())) AS logp
      |  FROM tok GROUP BY term)
      |SELECT t.doc_id, COUNT(*) AS n_tokens,
      |  ROUND(SUM(v.logp) / COUNT(*), 4) AS avg_logprob
      |FROM tok t JOIN vocab v ON v.term = t.term
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q116_mixture_weights" -> (q116MixtureWeights _),
    "q117_length_buckets"  -> (q117LengthBuckets _),
    "q118_inverted_index"  -> (q118InvertedIndex _),
    "q119_bloom_prune"     -> (q119BloomPrune _),
    "q120_unigram_logprob" -> (q120UnigramLogprob _))

  val oracles: Map[String, String] = Map(
    "q116_mixture_weights" -> q116Sql,
    "q117_length_buckets"  -> q117Sql,
    "q118_inverted_index"  -> q118Sql,
    "q119_bloom_prune"     -> q119Sql,
    "q120_unigram_logprob" -> q120Sql)
}
