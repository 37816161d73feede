package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * q29 is the scale path: two-level IVF coarse quantization (the r8
  * redesign — the old `vec_id % 97` centroid rule grew the centroid set
  * LINEARLY with the corpus, making the broadcast side O(n) and the
  * assignment stage O(n²/97) cosines: quadratic in disguise). Now:
  *
  *   - '''k is FIXED''' ([[K1]]): centroids are the k corpus vectors with
  *     the lowest `md5(vec_id)` — a deterministic, SQL-restatable stand-in
  *     for an offline k-means artifact with the same scale shape. The
  *     centroid set never grows with the data; real deployments size k
  *     (~√n) offline and ship the artifact.
  *   - '''Centroids are frozen as plan literals''' (the `operators/Scan`
  *     equi-depth pattern): k rows collected once, then level-1 assignment
  *     is a NARROW codegen argmax over k literal vectors — zero shuffles
  *     over the corpus, no broadcast re-evaluation hazard.
  *   - '''Hot cells sub-cluster''' (the `Dedup.hammingBandPairs` move,
  *     one level down): a cell with more than [[CellCap]] members gets
  *     [[K2]] sub-centroids (its lowest-md5 members) and its vectors
  *     re-assign to the nearest sub-centroid; `scid = -1` marks cold
  *     cells. Search and pair enumeration run per (cid, scid), so
  *     candidate sets are bounded by sub-cell size, not corpus size. The
  *     sub-centroid count is ≤ K1·K2 — still corpus-size-independent.
  *
  * [[CellCap]] = 62 ≈ the expected cell population at the driver's gate
  * SF, so BOTH postures (cold pass-through and hot subdivision) execute
  * under the gate; production sets it from the per-cell candidate budget.
  */
object Knn {

  val TopK = 5
  val NProbe = 2  // level-1 cells probed per query
  val NProbe2 = 2 // sub-cells probed inside a probed hot cell
  val K1 = 8      // fixed top-level centroid count (corpus-independent)
  val K2 = 4      // sub-centroids per hot cell
  val CellCap = 62

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

  // ------------------------------------------------------------------ IVF

  /** Frozen IVF geometry: level-1 centroids, the hot cell ids, and each
    * hot cell's sub-centroids — at most K1 + K1·K2 vectors total,
    * independent of corpus size, all plan literals.
    */
  private[graft] final case class IvfModel(
      cents: Seq[(Long, Seq[Float])],
      hotCids: Seq[Long],
      subCents: Map[Long, Seq[(Long, Seq[Float])]])

  /** Rounded cosine of `vec` against each literal centroid, as an array of
    * (c_sim, -cid) structs — struct ordering then gives "highest cosine,
    * ties to the LOWEST cid" for both max and descending sort, matching
    * the oracle's `ORDER BY cos DESC, cid`.
    */
  private def simStructs(vec: Column, cents: Seq[(Long, Seq[Float])]) =
    array(cents.map { case (cid, cv) =>
      struct(round(vectors.cosine_similarity(vec, typedLit(cv)), 6).as("c_sim"),
        lit(-cid).as("ncid"))
    }: _*)

  /** Nearest-centroid id as a narrow codegen expression (no join). */
  private def cellOf(vec: Column, cents: Seq[(Long, Seq[Float])]): Column =
    -array_max(simStructs(vec, cents)).getField("ncid")

  /** Top-`p` nearest centroid ids, best first (query-side multi-probe). */
  private def probeCells(vec: Column, cents: Seq[(Long, Seq[Float])],
      p: Int): Column =
    transform(slice(reverse(array_sort(simStructs(vec, cents))), 1, p),
      x => -x.getField("ncid"))

  /** Sub-cell id for a (vec, cid) pair: argmax over the cell's literal
    * sub-centroids for hot cells (a when-chain over ≤ K1 hot ids), -1 for
    * cold cells.
    */
  private def subCellOf(vec: Column, cidCol: Column, m: IvfModel): Column =
    m.hotCids.foldLeft(lit(-1L)) { (acc, c) =>
      when(cidCol === c, cellOf(vec, m.subCents(c))).otherwise(acc)
    }

  /** Top-`p` sub-cells of a probed cell (query side); `[-1]` when cold. */
  private def probeSubCells(vec: Column, cidCol: Column, m: IvfModel,
      p: Int): Column =
    m.hotCids.foldLeft(typedLit(Seq(-1L))) { (acc, c) =>
      when(cidCol === c, probeCells(vec, m.subCents(c), p)).otherwise(acc)
    }

  private def collectVecs(df: DataFrame): Seq[(Long, Seq[Float])] =
    df.collect().toSeq.map(r =>
      (r.getLong(0), r.getSeq[Float](1)))

  /** Fit the frozen model: three driver-side jobs, each collecting at most
    * K1·K2 rows — (1) top-K1 lowest-md5 centroids, (2) level-1 cell sizes
    * (K1 rows), (3) lowest-md5 sub-centroids of hot cells. Deterministic
    * (md5 order with vec_id ties; 6-dp rounded cosines), so re-evaluation
    * cannot diverge — the reason literals are safe where a broadcast
    * subplan would not be (see CLAUDE.md's sketch-aggregate rule).
    */
  private[graft] def fitIvf(emb: DataFrame, k1: Int = K1, k2: Int = K2,
      cellCap: Int = CellCap): IvfModel = {
    val cents = collectVecs(
      emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(k1)
        .select(col("vec_id"), col("embedding")))
    val withCell = emb.withColumn("cid", cellOf(col("embedding"), cents))
    val hotCids = withCell.groupBy("cid").agg(count(lit(1)).as("n"))
      .filter(col("n") > cellCap)
      .select("cid").collect().map(_.getLong(0)).toSeq.sorted
    val subCents =
      if (hotCids.isEmpty) Map.empty[Long, Seq[(Long, Seq[Float])]]
      else {
        // one window job over hot-cell members only (≤ corpus rows in,
        // ≤ K1·K2 rows out)
        val wc = Window.partitionBy("cid")
          .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        withCell.filter(col("cid").isin(hotCids: _*))
          .withColumn("s_rn", row_number().over(wc))
          .filter(col("s_rn") <= k2)
          .select(col("cid"), col("vec_id"), col("embedding"))
          .collect().toSeq
          .map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Float](2))))
          .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      }
    IvfModel(cents, hotCids, subCents)
  }

  /** Corpus assignment under a frozen model: ONE narrow codegen pass —
    * (cid, scid) per vector, zero shuffles, zero joins.
    */
  private[graft] def assignCorpus(emb: DataFrame, m: IvfModel): DataFrame = {
    val withCell = emb.withColumn("cid", cellOf(col("embedding"), m.cents))
    withCell.withColumn("scid",
      subCellOf(col("embedding"), col("cid"), m))
  }

  /** IVF ANN: queries probe their [[NProbe]] nearest cells (and, inside a
    * hot cell, the [[NProbe2]] nearest sub-cells), then search ONLY those
    * (cid, scid) buckets — the standard multi-probe recall lever, with
    * candidates per query bounded by sub-cell size. The tiny probed query
    * set broadcasts against the assigned corpus on an equi-key, so the
    * search join is a broadcast hash join, not a fan-out.
    */
  def q29AnnIvf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val m = fitIvf(emb)
    val corpus = assignCorpus(emb, m)
    val queries = Tables.embeddings(s, d).filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      // non-empty literal arrays: explode_outer avoids the inferred
      // size()>0 pre-filter re-evaluating the probe expression
      .select(col("qid"), col("qv"),
        explode_outer(probeCells(col("qv"), m.cents, NProbe)).as("cid"))
      .select(col("qid"), col("qv"), col("cid"),
        explode_outer(probeSubCells(col("qv"), col("cid"), m, NProbe2))
          .as("scid"))
    val w = Window.partitionBy("qid").orderBy(desc("cos_sim"), col("vec_id"))
    corpus.join(broadcast(queries), Seq("cid", "scid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos_sim", cosRounded)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TopK)
      .select("qid", "vec_id", "cos_sim", "rn")
      .orderBy("qid", "rn")
  }

  /** Shared SQL prologue restating the frozen model + corpus assignment:
    * fixed-k lowest-md5 centroids, level-1 argmax, hot cells by CellCap,
    * lowest-md5 sub-centroids, two-level corpus assignment. The model is
    * deterministic given the corpus, so the ANN result — unlike a
    * hash-based LSH candidate set — is exactly checkable; 6-dp rounding
    * on both sides (bit-compatibility established by q28).
    */
  private[graft] val ivfSqlPrologue: String =
    s"""centroids AS (
       |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $K1),
       |l1 AS (
       |  SELECT vec_id, embedding, cid FROM (
       |    SELECT e.vec_id, e.embedding, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                     CAST(c.cv AS DOUBLE[])), 6) DESC,
       |        c.cid) AS rn
       |    FROM embeddings e CROSS JOIN centroids c)
       |  WHERE rn = 1),
       |hot AS (
       |  SELECT cid FROM l1 GROUP BY cid HAVING COUNT(*) > $CellCap),
       |subc AS (
       |  SELECT cid, vec_id AS scid, embedding AS scv FROM (
       |    SELECT l1.cid, l1.vec_id, l1.embedding,
       |      ROW_NUMBER() OVER (PARTITION BY l1.cid ORDER BY
       |        md5(CAST(l1.vec_id AS VARCHAR)), l1.vec_id) AS rn
       |    FROM l1 JOIN hot USING (cid))
       |  WHERE rn <= $K2),
       |hot_assign AS (
       |  SELECT vec_id, embedding, cid, scid FROM (
       |    SELECT l1.vec_id, l1.embedding, l1.cid, s.scid,
       |      ROW_NUMBER() OVER (PARTITION BY l1.vec_id ORDER BY
       |        ROUND(list_cosine_similarity(CAST(l1.embedding AS DOUBLE[]),
       |                                     CAST(s.scv AS DOUBLE[])), 6) DESC,
       |        s.scid) AS rn
       |    FROM l1 JOIN subc s ON l1.cid = s.cid)
       |  WHERE rn = 1),
       |corpus_assign AS (
       |  SELECT vec_id, embedding, cid, CAST(-1 AS BIGINT) AS scid FROM l1
       |  WHERE cid NOT IN (SELECT cid FROM hot)
       |  UNION ALL
       |  SELECT vec_id, embedding, cid, scid FROM hot_assign)""".stripMargin

  val q29Sql: String =
    s"""WITH $ivfSqlPrologue,
       |q_l1 AS (
       |  SELECT qid, qv, cid FROM (
       |    SELECT e.vec_id AS qid, e.embedding AS qv, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                     CAST(c.cv AS DOUBLE[])), 6) DESC,
       |        c.cid) AS rn
       |    FROM embeddings e CROSS JOIN centroids c
       |    WHERE e.vec_id < 10)
       |  WHERE rn <= $NProbe),
       |q_sub AS (
       |  SELECT qid, qv, cid, scid FROM (
       |    SELECT q.qid, q.qv, q.cid, s.scid,
       |      ROW_NUMBER() OVER (PARTITION BY q.qid, q.cid ORDER BY
       |        ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
       |                                     CAST(s.scv AS DOUBLE[])), 6) DESC,
       |        s.scid) AS rn
       |    FROM q_l1 q JOIN subc s ON q.cid = s.cid)
       |  WHERE rn <= $NProbe2),
       |q_assign AS (
       |  SELECT qid, qv, cid, CAST(-1 AS BIGINT) AS scid FROM q_l1
       |  WHERE cid NOT IN (SELECT cid FROM hot)
       |  UNION ALL
       |  SELECT qid, qv, cid, scid FROM q_sub),
       |ranked AS (
       |  SELECT q.qid, a.vec_id,
       |    ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
       |                                 CAST(a.embedding AS DOUBLE[])), 6) AS cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
       |      ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
       |                                   CAST(a.embedding AS DOUBLE[])), 6) DESC,
       |      a.vec_id) AS rn
       |  FROM q_assign q JOIN corpus_assign a
       |    ON q.cid = a.cid AND q.scid = a.scid
       |  WHERE a.vec_id <> q.qid)
       |SELECT qid, vec_id, cos_sim, rn FROM ranked WHERE rn <= $TopK
       |ORDER BY qid, rn""".stripMargin

  // ----------------------------------------------------------------- PQ

  /** Product-quantization parameters: 64 dims → [[MSub]] subspaces of
    * [[SubDim]] dims, [[KPq]] codes per subspace. A vector stores as
    * MSub small ints (8 bytes at KPq ≤ 256) instead of 64 floats
    * (256 bytes) — the 32× memory compression that lets a 100 TB corpus'
    * ANN index live executor-resident while raw vectors stay on disk.
    */
  val MSub = 8
  val SubDim = 8
  val KPq = 16

  /** Deterministic PQ codebook: code k of subspace j is the j-th
    * [[SubDim]]-slice of the k-th lowest-md5 corpus vector — the same
    * SQL-restatable stand-in for an offline per-subspace k-means that
    * [[fitIvf]] uses for centroids. `cb(j)(k)` is a literal; the whole
    * codebook is KPq·64 floats (4 KB), corpus-size-independent.
    */
  private[graft] def fitPq(emb: DataFrame): Seq[Seq[Seq[Float]]] = {
    val anchors = collectVecs(
      emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(KPq)
        .select(col("vec_id"), col("embedding")))
    Seq.tabulate(MSub) { j =>
      anchors.map { case (_, v) => v.slice(j * SubDim, (j + 1) * SubDim) }
    }
  }

  /** Per-subspace code assignment: argmax of 6-dp-rounded cosine against
    * the KPq literal sub-centers, ties to the lowest code — one narrow
    * codegen expression per subspace (the [[cellOf]] machinery on
    * slices), no join, no shuffle.
    */
  private def pqCodes(vec: Column, cb: Seq[Seq[Seq[Float]]]): Column =
    array(Seq.tabulate(MSub) { j =>
      val sub = slice(vec, j * SubDim + 1, SubDim)
      cellOf(sub, cb(j).zipWithIndex.map { case (cv, k) => (k.toLong, cv) })
        .cast("int")
    }: _*)

  /** Reconstruction (decode): concatenate each subspace's chosen literal
    * sub-center — `element_at` over a per-subspace literal code table,
    * statically unrolled.
    */
  private def pqReconstruct(codes: Column, cb: Seq[Seq[Seq[Float]]]): Column =
    concat(Seq.tabulate(MSub) { j =>
      element_at(typedLit(cb(j)), element_at(codes, j + 1) + 1)
    }: _*)

  /** Diagnostic/spec surface: encode + decode in one narrow pass —
    * (vec_id, embedding, rec, codes).
    */
  private[graft] def pqEncodeDecode(emb: DataFrame,
      cb: Seq[Seq[Seq[Float]]]): DataFrame =
    emb.withColumn("codes", pqCodes(col("embedding"), cb))
      .withColumn("rec", pqReconstruct(col("codes"), cb))
      .select("vec_id", "embedding", "rec", "codes")

  /** IVF-PQ ANN: q29's frozen two-level IVF prunes WHICH vectors a query
    * scores (multi-probe over (cid, scid) buckets); PQ compresses WHAT is
    * scored — candidates are ranked by asymmetric distance (raw query
    * against the candidate's codebook reconstruction), so the scoring
    * stage touches only the 8-byte codes + the 4 KB codebook, never the
    * raw corpus vectors. One narrow pass assigns cells AND codes; the
    * probed query set broadcasts onto the bucket equi-key exactly as in
    * q29. Output is deterministic end-to-end (rounded cosines, lowest-id
    * ties), so the oracle restates the full model — anchors, slices,
    * encode argmax, reconstruction, probe, ADC ranking — in SQL.
    */
  def q154AnnIvfPq(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val m = fitIvf(emb)
    val cb = fitPq(Tables.embeddings(s, d).select("vec_id", "embedding"))
    // one narrow projection: IVF cell, sub-cell, PQ codes, reconstruction
    val corpus = assignCorpus(emb, m)
      .withColumn("codes", pqCodes(col("embedding"), cb))
      .withColumn("rec", pqReconstruct(col("codes"), cb))
      .select("vec_id", "cid", "scid", "rec")
    val queries = Tables.embeddings(s, d).filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .select(col("qid"), col("qv"),
        explode_outer(probeCells(col("qv"), m.cents, NProbe)).as("cid"))
      .select(col("qid"), col("qv"), col("cid"),
        explode_outer(probeSubCells(col("qv"), col("cid"), m, NProbe2))
          .as("scid"))
    val adc = round(vectors.cosine_similarity(col("qv"), col("rec")), 6)
    val w = Window.partitionBy("qid").orderBy(desc("adc_sim"), col("vec_id"))
    corpus.join(broadcast(queries), Seq("cid", "scid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("adc_sim", adc)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TopK)
      .select("qid", "vec_id", "adc_sim", "rn")
      .orderBy("qid", "rn")
  }

  val q154Sql: String =
    s"""WITH $ivfSqlPrologue,
       |pq_anchor AS (
       |  SELECT k, av FROM (
       |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
       |      vec_id) - 1 AS k, embedding AS av
       |    FROM embeddings)
       |  WHERE k < $KPq),
       |pq_cb AS (
       |  SELECT j, k, list_slice(av, j*$SubDim + 1, j*$SubDim + $SubDim) AS cv8
       |  FROM pq_anchor CROSS JOIN generate_series(0, ${MSub - 1}) AS t(j)),
       |enc AS (
       |  SELECT vec_id, j, k AS code FROM (
       |    SELECT a.vec_id, c.j, c.k,
       |      ROW_NUMBER() OVER (PARTITION BY a.vec_id, c.j ORDER BY
       |        ROUND(list_cosine_similarity(
       |          CAST(list_slice(a.embedding, c.j*$SubDim + 1,
       |                          c.j*$SubDim + $SubDim) AS DOUBLE[]),
       |          CAST(c.cv8 AS DOUBLE[])), 6) DESC, c.k) AS rn
       |    FROM corpus_assign a CROSS JOIN pq_cb c)
       |  WHERE rn = 1),
       |rec AS (
       |  SELECT e.vec_id, flatten(list(c.cv8 ORDER BY e.j)) AS rv
       |  FROM enc e JOIN pq_cb c ON e.j = c.j AND e.code = c.k
       |  GROUP BY e.vec_id),
       |q_l1 AS (
       |  SELECT qid, qv, cid FROM (
       |    SELECT e.vec_id AS qid, e.embedding AS qv, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                     CAST(c.cv AS DOUBLE[])), 6) DESC,
       |        c.cid) AS rn
       |    FROM embeddings e CROSS JOIN centroids c
       |    WHERE e.vec_id < 10)
       |  WHERE rn <= $NProbe),
       |q_sub AS (
       |  SELECT qid, qv, cid, scid FROM (
       |    SELECT q.qid, q.qv, q.cid, s.scid,
       |      ROW_NUMBER() OVER (PARTITION BY q.qid, q.cid ORDER BY
       |        ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
       |                                     CAST(s.scv AS DOUBLE[])), 6) DESC,
       |        s.scid) AS rn
       |    FROM q_l1 q JOIN subc s ON q.cid = s.cid)
       |  WHERE rn <= $NProbe2),
       |q_assign AS (
       |  SELECT qid, qv, cid, CAST(-1 AS BIGINT) AS scid FROM q_l1
       |  WHERE cid NOT IN (SELECT cid FROM hot)
       |  UNION ALL
       |  SELECT qid, qv, cid, scid FROM q_sub),
       |ranked AS (
       |  SELECT q.qid, a.vec_id,
       |    ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
       |                                 CAST(r.rv AS DOUBLE[])), 6) AS adc_sim,
       |    ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
       |      ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
       |                                   CAST(r.rv AS DOUBLE[])), 6) DESC,
       |      a.vec_id) AS rn
       |  FROM q_assign q JOIN corpus_assign a
       |    ON q.cid = a.cid AND q.scid = a.scid
       |  JOIN rec r ON r.vec_id = a.vec_id
       |  WHERE a.vec_id <> q.qid)
       |SELECT qid, vec_id, adc_sim, rn FROM ranked WHERE rn <= $TopK
       |ORDER BY qid, rn""".stripMargin

  // ------------------------------------------------------------- re-rank

  /** ADC candidates carried into the exact re-rank stage, per query. The
    * production dial: recall approaches the candidate-set ceiling as R
    * grows, at R extra exact cosines per query — bounded work independent
    * of corpus size.
    */
  val RerankR = 20

  /** IVF-PQ ANN with exact re-ranking — the standard production refinement
    * over q154: ADC ranking (8-byte codes + 4 KB codebook only) selects
    * the top-[[RerankR]] candidates per query, then ONLY those |Q|·R rows
    * fetch their raw vectors for an exact-cosine re-rank. PQ's
    * reconstruction error can reorder true neighbors inside the candidate
    * list but the re-rank stage restores the exact order, so recall@k
    * equals the candidate-set ceiling (asserted in DedupKnnSpec at two
    * SFs, alongside recall(q156) ≥ recall(q154)).
    *
    * Scale posture: stage 1 is q154's shape (narrow encode pass, broadcast
    * probe join, per-bucket candidates); stage 2 broadcasts the tiny
    * candidate list (qid, qv, vec_id) onto an independent corpus read by
    * vec_id equi-key — the 100 TB corpus is scanned, never shuffled, and
    * raw vectors travel only for candidates.
    */
  def q156AnnRerank(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select("vec_id", "embedding")
    val m = fitIvf(emb)
    val cb = fitPq(Tables.embeddings(s, d).select("vec_id", "embedding"))
    val corpus = assignCorpus(emb, m)
      .withColumn("codes", pqCodes(col("embedding"), cb))
      .withColumn("rec", pqReconstruct(col("codes"), cb))
      .select("vec_id", "cid", "scid", "rec")
    val queries = Tables.embeddings(s, d).filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      .select(col("qid"), col("qv"),
        explode_outer(probeCells(col("qv"), m.cents, NProbe)).as("cid"))
      .select(col("qid"), col("qv"), col("cid"),
        explode_outer(probeSubCells(col("qv"), col("cid"), m, NProbe2))
          .as("scid"))
    val adc = round(vectors.cosine_similarity(col("qv"), col("rec")), 6)
    val wAdc = Window.partitionBy("qid").orderBy(desc("adc_sim"), col("vec_id"))
    val cands = corpus.join(broadcast(queries), Seq("cid", "scid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("adc_sim", adc)
      .withColumn("adc_rn", row_number().over(wAdc))
      .filter(col("adc_rn") <= RerankR)
      .select("qid", "qv", "vec_id")
    // independent read (not `emb`): joining two derivations of one lineage
    // trips AMBIGUOUS_SELF_JOIN (CLAUDE.md)
    val raw = Tables.embeddings(s, d).select("vec_id", "embedding")
    val w = Window.partitionBy("qid").orderBy(desc("cos_sim"), col("vec_id"))
    raw.join(broadcast(cands), Seq("vec_id"))
      .withColumn("cos_sim", cosRounded)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= TopK)
      .select("qid", "vec_id", "cos_sim", "rn")
      .orderBy("qid", "rn")
  }

  val q156Sql: String =
    s"""WITH $ivfSqlPrologue,
       |pq_anchor AS (
       |  SELECT k, av FROM (
       |    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
       |      vec_id) - 1 AS k, embedding AS av
       |    FROM embeddings)
       |  WHERE k < $KPq),
       |pq_cb AS (
       |  SELECT j, k, list_slice(av, j*$SubDim + 1, j*$SubDim + $SubDim) AS cv8
       |  FROM pq_anchor CROSS JOIN generate_series(0, ${MSub - 1}) AS t(j)),
       |enc AS (
       |  SELECT vec_id, j, k AS code FROM (
       |    SELECT a.vec_id, c.j, c.k,
       |      ROW_NUMBER() OVER (PARTITION BY a.vec_id, c.j ORDER BY
       |        ROUND(list_cosine_similarity(
       |          CAST(list_slice(a.embedding, c.j*$SubDim + 1,
       |                          c.j*$SubDim + $SubDim) AS DOUBLE[]),
       |          CAST(c.cv8 AS DOUBLE[])), 6) DESC, c.k) AS rn
       |    FROM corpus_assign a CROSS JOIN pq_cb c)
       |  WHERE rn = 1),
       |rec AS (
       |  SELECT e.vec_id, flatten(list(c.cv8 ORDER BY e.j)) AS rv
       |  FROM enc e JOIN pq_cb c ON e.j = c.j AND e.code = c.k
       |  GROUP BY e.vec_id),
       |q_l1 AS (
       |  SELECT qid, qv, cid FROM (
       |    SELECT e.vec_id AS qid, e.embedding AS qv, c.cid,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                     CAST(c.cv AS DOUBLE[])), 6) DESC,
       |        c.cid) AS rn
       |    FROM embeddings e CROSS JOIN centroids c
       |    WHERE e.vec_id < 10)
       |  WHERE rn <= $NProbe),
       |q_sub AS (
       |  SELECT qid, qv, cid, scid FROM (
       |    SELECT q.qid, q.qv, q.cid, s.scid,
       |      ROW_NUMBER() OVER (PARTITION BY q.qid, q.cid ORDER BY
       |        ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
       |                                     CAST(s.scv AS DOUBLE[])), 6) DESC,
       |        s.scid) AS rn
       |    FROM q_l1 q JOIN subc s ON q.cid = s.cid)
       |  WHERE rn <= $NProbe2),
       |q_assign AS (
       |  SELECT qid, qv, cid, CAST(-1 AS BIGINT) AS scid FROM q_l1
       |  WHERE cid NOT IN (SELECT cid FROM hot)
       |  UNION ALL
       |  SELECT qid, qv, cid, scid FROM q_sub),
       |adc_ranked AS (
       |  SELECT q.qid, q.qv, a.vec_id,
       |    ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
       |      ROUND(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
       |                                   CAST(r.rv AS DOUBLE[])), 6) DESC,
       |      a.vec_id) AS adc_rn
       |  FROM q_assign q JOIN corpus_assign a
       |    ON q.cid = a.cid AND q.scid = a.scid
       |  JOIN rec r ON r.vec_id = a.vec_id
       |  WHERE a.vec_id <> q.qid),
       |cand AS (
       |  SELECT qid, qv, vec_id FROM adc_ranked WHERE adc_rn <= $RerankR),
       |rer AS (
       |  SELECT c.qid, c.vec_id,
       |    ROUND(list_cosine_similarity(CAST(c.qv AS DOUBLE[]),
       |                                 CAST(e.embedding AS DOUBLE[])), 6) AS cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY c.qid ORDER BY
       |      ROUND(list_cosine_similarity(CAST(c.qv AS DOUBLE[]),
       |                                   CAST(e.embedding AS DOUBLE[])), 6) DESC,
       |      c.vec_id) AS rn
       |  FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id)
       |SELECT qid, vec_id, cos_sim, rn FROM rer WHERE rn <= $TopK
       |ORDER BY qid, rn""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_knn_exact" -> (q28Knn _),
    "q29_ann_ivf" -> (q29AnnIvf _),
    "q154_ann_ivfpq" -> (q154AnnIvfPq _),
    "q156_ann_rerank" -> (q156AnnRerank _))

  val oracles: Map[String, String] = Map(
    "q28_knn_exact" -> q28Sql,
    "q29_ann_ivf" -> q29Sql,
    "q154_ann_ivfpq" -> q154Sql,
    "q156_ann_rerank" -> q156Sql)
}
