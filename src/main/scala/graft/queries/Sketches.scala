package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.cms

/** Frequency-sketch analytics (round 11).
  *
  * q165: heavy-hitter audit via a count-min sketch
  * ([[graft.functions.CmsAggregate]]) — the mergeable-sketch answer to
  * "what are the hot tokens and how much does a 4×128 sketch overestimate
  * them". At 100 TB the exact per-term count table this query compares
  * against is itself a heavyweight aggregate; the sketch is d·w longs per
  * partial buffer, collapsed map-side, merge-order-invariant (sums
  * commute — contrast the approx_percentile rule, whose sketches are NOT
  * run-stable). Because the hash family is md5-derived, the WHOLE counter
  * matrix restates in DuckDB and the query is hash-oracled end to end —
  * the q23/q27 md5-parameterized-kernel pattern applied to a sketch
  * aggregate.
  */
object Sketches {

  private val D = 4
  private val W = 128
  private val TopK = 20

  // ---------------------------------------------------------------- q165
  // One tokenize pass (the q143/q149 materialize-once rule): exact term
  // counts feed BOTH the top-20 selection and the weighted sketch build
  // (counters depend only on the term multiset, so sketching the counted
  // table is identical to sketching the raw stream). The 1-row sketch
  // broadcast-crosses onto the top terms; estimates are codegen
  // element_at/least over the array. CMS guarantee surfaced per row:
  // n_est >= n_exact always (SketchesSpec pins it), equality when the
  // term's d buckets are collision-free.
  def q165CmsHeavyHitters(s: SparkSession, d: String): DataFrame = {
    val termCounts = Tables.documents(s, d)
      .select(explode_outer(expr("regexp_extract_all(text, '\\\\S+', 0)"))
        .as("term"))
      .filter(col("term").isNotNull)
      .groupBy("term").agg(count(lit(1)).as("n_exact"))
      .localCheckpoint(true) // one tokenize+count, two consumers below
    val sketch = termCounts
      .agg(cms.cms_sketch(col("term"), col("n_exact"), D, W).as("sk"))
    val top = termCounts
      .orderBy(desc("n_exact"), asc("term")).limit(TopK)
    top.crossJoin(broadcast(sketch))
      .select(col("term"), col("n_exact"),
        cms.cms_estimate(col("sk"), col("term"), D, W).as("n_est"))
      .orderBy(desc("n_exact"), asc("term"))
  }

  /** The full sketch restated: counters from the same md5 hash family
    * (q127's unsigned-% congruence — W is a power of two), estimates as
    * the min over the d matching counters.
    */
  val q165Sql: String =
    s"""WITH t AS (
       |  SELECT unnest(regexp_extract_all(text, '\\S+')) AS term
       |  FROM documents),
       |tc AS (SELECT term, COUNT(*) AS n_exact FROM t GROUP BY 1),
       |js AS (SELECT unnest([${(0 until D).mkString(", ")}]) AS j),
       |cnt AS (
       |  SELECT j,
       |    CAST(md5_number_lower(CAST(j AS VARCHAR) || ':' || term) % $W
       |      AS BIGINT) AS b,
       |    CAST(SUM(n_exact) AS BIGINT) AS c
       |  FROM tc CROSS JOIN js GROUP BY 1, 2),
       |top AS (
       |  SELECT term, n_exact FROM tc
       |  ORDER BY n_exact DESC, term LIMIT $TopK),
       |est AS (
       |  SELECT top.term, top.n_exact, MIN(cnt.c) AS n_est
       |  FROM top JOIN cnt
       |    ON cnt.b = CAST(md5_number_lower(
       |         CAST(cnt.j AS VARCHAR) || ':' || top.term) % $W AS BIGINT)
       |  GROUP BY 1, 2)
       |SELECT term, n_exact, n_est FROM est
       |ORDER BY n_exact DESC, term""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q165_cms_heavyhitters" -> (q165CmsHeavyHitters _))

  val oracles: Map[String, String] = Map(
    "q165_cms_heavyhitters" -> q165Sql)
}
