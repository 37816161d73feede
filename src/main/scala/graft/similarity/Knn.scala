package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.vectors

/** Approximate-nearest-neighbor surface over the `embeddings` table
  * (64-dim `array<float>`).
  *
  * q28 is the exact baseline: broadcast the (small) query set against the
  * corpus — one narrow pass, cosine via the codegen'd
  * [[graft.functions.VectorExpressions.CosineSimilarity]] expression, then
  * per-query top-k via rank-filter (WindowGroupLimit keeps k rows per
  * partition, no global sort). At 100 TB the corpus side stays partitioned
  * and is read once; cost is O(|corpus| × |queries|) dot products, the
  * correct baseline shape.
  *
  * q29 is the scale path: IVF-style coarse quantization. Centroids (a
  * deterministic sample here; k-means offline in production) are broadcast,
  * every vector is assigned to its nearest centroid in one pass, and each
  * query searches ONLY its probe cluster — pruning the candidate set by
  * ~|centroids|× at the cost of recall (measured in KnnSpec).
  */
object Knn {

  val TopK = 5
  private val cosRounded =
    round(vectors.cosine_similarity(col("qv"), col("embedding")), 6)

  /** Exact top-k: deterministic output via rounded cosine + vec_id ties. */
  def q28Knn(s: SparkSession, d: String): DataFrame = {
    val queries = Tables.embeddings(s, d).filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val corpus = Tables.embeddings(s, d).select("vec_id", "embedding")
    val w = Window.partitionBy("qid").orderBy(desc("cos_sim"), col("vec_id"))
    corpus.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("cos_sim", cosRounded)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TopK)
      .select("qid", "vec_id", "cos_sim", "rn")
      .orderBy("qid", "rn")
  }

  val q28Sql: String =
    s"""WITH pairs AS (
       |  SELECT q.vec_id AS qid, c.vec_id AS vec_id,
       |    ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                 CAST(c.embedding AS DOUBLE[])), 6) AS cos_sim
       |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |    ORDER BY cos_sim DESC, vec_id) AS rn FROM pairs)
       |SELECT qid, vec_id, cos_sim, rn FROM ranked WHERE rn <= $TopK
       |ORDER BY qid, rn""".stripMargin

  /** IVF-style ANN: assign corpus to nearest centroid (broadcast), probe
    * the query's `nprobe` closest clusters (multi-probe is the standard
    * recall lever — candidates grow linearly with nprobe while staying
    * ~|centroids|/nprobe× smaller than the corpus). Deterministic
    * centroid choice (vec_id % 97 == 0) stands in for offline k-means.
    */
  val NProbe = 2

  def q29AnnIvf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val centroids = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))

    def assign(df: DataFrame, idCol: String, vecCol: String, probes: Int): DataFrame = {
      val w = Window.partitionBy(idCol)
        .orderBy(desc("c_sim"), col("cid"))
      df.join(broadcast(centroids))
        .withColumn("c_sim", round(vectors.cosine_similarity(col(vecCol), col("cv")), 6))
        .withColumn("c_rn", row_number().over(w))
        .filter(col("c_rn") <= probes)
        .drop("cv", "c_sim", "c_rn")
    }

    val assigned = assign(
      emb.select(col("vec_id"), col("embedding")), "vec_id", "embedding", probes = 1)
    val queries = assign(
      emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")), "qid", "qv",
      probes = NProbe)

    val w = Window.partitionBy("qid").orderBy(desc("cos_sim"), col("vec_id"))
    assigned.join(queries, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos_sim", cosRounded)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TopK)
      .select("qid", "vec_id", "cos_sim", "rn")
      .orderBy("qid", "rn")
  }

  /** q29's oracle restates the IVF plan itself in SQL (centroid argmax
    * assignment, probe-2 query fan-out, in-cluster top-k): the ANN result
    * is deterministic given the centroid rule, so unlike a hash-based LSH
    * candidate set it IS exactly checkable. Cosines are rounded on both
    * sides before ranking — q28 established bit-compatibility of the
    * rounded cosine between the codegen expression and DuckDB.
    */
  val q29Sql: String =
    s"""WITH centroids AS (
       |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  WHERE vec_id % 97 = 0),
       |corpus_assign AS (
       |  SELECT vec_id, embedding, cid FROM (
       |    SELECT e.vec_id, e.embedding, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                     CAST(c.cv AS DOUBLE[])), 6) DESC,
       |        c.cid) AS c_rn
       |    FROM embeddings e CROSS JOIN centroids c)
       |  WHERE c_rn <= 1),
       |query_assign AS (
       |  SELECT qid, qv, cid FROM (
       |    SELECT e.vec_id AS qid, e.embedding AS qv, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                     CAST(c.cv AS DOUBLE[])), 6) DESC,
       |        c.cid) AS c_rn
       |    FROM embeddings e CROSS JOIN centroids c
       |    WHERE e.vec_id < 10)
       |  WHERE c_rn <= $NProbe),
       |ranked AS (
       |  SELECT q.qid, a.vec_id,
       |    ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
       |                                 CAST(a.embedding AS DOUBLE[])), 6) AS cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
       |      ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
       |                                   CAST(a.embedding AS DOUBLE[])), 6) DESC,
       |      a.vec_id) AS rn
       |  FROM query_assign q JOIN corpus_assign a ON q.cid = a.cid
       |  WHERE a.vec_id <> q.qid)
       |SELECT qid, vec_id, cos_sim, rn FROM ranked WHERE rn <= $TopK
       |ORDER BY qid, rn""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_knn_exact" -> (q28Knn _),
    "q29_ann_ivf" -> (q29AnnIvf _))

  val oracles: Map[String, String] = Map(
    "q28_knn_exact" -> q28Sql,
    "q29_ann_ivf" -> q29Sql)
}
