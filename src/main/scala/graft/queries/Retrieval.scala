package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Retrieval-adjacent operators — TF-IDF term scoring and embedding
  * centroid aggregation, the scoring/statistics side of a training-data
  * search stack (the LSH/KNN family covers candidate generation; these
  * cover ranking features and corpus statistics).
  */
object Retrieval {

  // ---------------------------------------------------------------- q74
  // TF-IDF top terms per document. All shuffles are on (doc, term) or
  // term — standard map-side-combined aggregations; the idf table is
  // vocabulary-sized and broadcasts. Ranking uses the ROUNDED score so
  // last-ulp float differences cannot flip the rank order between
  // engines; ties break on the term itself.
  def q74Tfidf(s: SparkSession, d: String): DataFrame = {
    val sample = Tables.documents(s, d).filter(col("doc_id") < 200)
    val tokens = sample.select(col("doc_id"),
      explode(expr("regexp_extract_all(text, '\\\\S+', 0)")).as("term"))
    val tf = tokens.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = sample.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(df), "term").crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") *
        log((col("n_docs") + 1.0) / (col("df") + 1.0)), 6))
    val w = Window.partitionBy("doc_id").orderBy(desc("tfidf"), col("term"))
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3 && col("doc_id") < 50)
      .select("doc_id", "rn", "term", "tf", "df", "tfidf")
      .orderBy("doc_id", "rn")
  }

  val q74Sql: String =
    """WITH sample AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < 200),
      |tokens AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
      |  FROM sample),
      |tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM tokens GROUP BY 1, 2),
      |df AS (
      |  SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_docs FROM sample),
      |scored AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |    ROUND(tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
      |  FROM tf JOIN df USING (term) CROSS JOIN n),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
      |    ORDER BY tfidf DESC, term) AS rn
      |  FROM scored)
      |SELECT doc_id, rn, term, tf, df, tfidf FROM ranked
      |WHERE rn <= 3 AND doc_id < 50
      |ORDER BY doc_id, rn""".stripMargin

  // ---------------------------------------------------------------- q75
  // Embedding centroids per shard: posexplode → per-(group, dimension)
  // exact decimal sum → double mean. The decimal routing makes the
  // reduction order-insensitive, so a 1000-executor tree aggregation
  // produces the same bits as DuckDB's serial sum — the only way a
  // float-vector mean can be hash-verified cross-engine.
  def q75EmbeddingCentroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select((col("vec_id") % 5).as("shard"),
        posexplode(col("embedding")).as(Seq("pos", "val")))
      .filter(col("pos") < 8)
      .groupBy(col("shard"), col("pos").cast("long").as("pos"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("val").cast(DecimalType(20, 10))).cast("double") /
          count(lit(1)), 6).as("centroid"))
      .orderBy("shard", "pos")

  val q75Sql: String =
    """SELECT vec_id % 5 AS shard, CAST(u.pos AS BIGINT) AS pos,
      |  COUNT(*) AS n,
      |  ROUND(CAST(SUM(CAST(u.val AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*), 6)
      |    AS centroid
      |FROM (SELECT vec_id,
      |        unnest(list_transform(embedding, (v, i) -> {'pos': i - 1, 'val': v})) AS u
      |      FROM embeddings)
      |WHERE u.pos < 8
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q87
  // One Lloyd iteration of distributed k-means over the embeddings (the
  // refinement step that turns q29's seeded centroids into trained ones):
  // broadcast-assign every vector to its argmax-cosine centroid, compute
  // per-dimension DECIMAL-exact means, report cluster size + L1 drift of
  // each centroid. Every arithmetic step is order-insensitive (decimal
  // sums) or identical-per-value (double division, abs), so a genuinely
  // iterative ML kernel is hash-verified cross-engine.
  def q87KmeansStep(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val emb = Tables.embeddings(s, d)
    val centroids = emb.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val w = Window.partitionBy("vec_id").orderBy(desc("c_sim"), col("cid"))
    val assigned = emb.select(col("vec_id"), col("embedding"))
      .join(broadcast(centroids))
      .withColumn("c_sim", round(
        graft.functions.vectors.cosine_similarity(col("embedding"), col("cv")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("cid", "vec_id", "embedding")
    val sizes = assigned.groupBy("cid").agg(count(lit(1)).as("n_members"))
    val means = assigned
      .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .groupBy("cid", "pos")
      .agg((sum(col("val").cast(DecimalType(20, 10))).cast("double") /
        count(lit(1))).as("mean"))
    val old = centroids
      .select(col("cid"), posexplode(col("cv")).as(Seq("pos", "old_val")))
    means.join(old, Seq("cid", "pos"))
      .groupBy("cid")
      .agg(round(sum(abs(col("mean") - col("old_val").cast("double"))
        .cast(DecimalType(20, 10))).cast("double"), 6).as("l1_drift"))
      .join(sizes, "cid")
      .select("cid", "n_members", "l1_drift")
      .orderBy("cid")
  }

  val q87Sql: String =
    """WITH c AS (
      |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
      |  WHERE vec_id % 97 = 0),
      |a AS (
      |  SELECT cid, vec_id, embedding FROM (
      |    SELECT e.vec_id, e.embedding, c.cid,
      |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
      |        ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |                                     CAST(c.cv AS DOUBLE[])), 6) DESC,
      |        c.cid) AS rn
      |    FROM embeddings e CROSS JOIN c)
      |  WHERE rn = 1),
      |dims AS (
      |  SELECT cid, u.pos, u.val FROM (
      |    SELECT cid,
      |      unnest(list_transform(embedding, (v, i) -> {'pos': i - 1, 'val': v})) AS u
      |    FROM a)),
      |means AS (
      |  SELECT cid, pos,
      |    CAST(SUM(CAST(val AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*) AS mean
      |  FROM dims GROUP BY 1, 2),
      |old AS (
      |  SELECT cid, u.pos, u.val AS old_val FROM (
      |    SELECT cid,
      |      unnest(list_transform(cv, (v, i) -> {'pos': i - 1, 'val': v})) AS u
      |    FROM c)),
      |sizes AS (SELECT cid, COUNT(*) AS n_members FROM a GROUP BY 1)
      |SELECT means.cid, sizes.n_members,
      |  ROUND(CAST(SUM(CAST(ABS(means.mean - CAST(old.old_val AS DOUBLE))
      |                      AS DECIMAL(20,10))) AS DOUBLE), 6) AS l1_drift
      |FROM means
      |JOIN old ON means.cid = old.cid AND means.pos = old.pos
      |JOIN sizes ON means.cid = sizes.cid
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q74_tfidf" -> (q74Tfidf _),
    "q75_embedding_centroids" -> (q75EmbeddingCentroids _),
    "q87_kmeans_step" -> (q87KmeansStep _))

  val oracles: Map[String, String] = Map(
    "q74_tfidf" -> q74Sql,
    "q75_embedding_centroids" -> q75Sql,
    "q87_kmeans_step" -> q87Sql)
}
