package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Stream-side set-similarity join (q153): the documents corpus replayed
  * as a bounded micro-batch stream through `foreachBatch`, each batch
  * folded into [[graft.operators.IncrementalSetSim]]'s append-only
  * prefix index — the CDC-shaped near-dup path the batch operators
  * (q143/q149) lacked (VERDICT r7 stretch item 8).
  *
  * The driver-facing result is the CONVERGED pair sink after the drain,
  * which must equal the batch PPJoin answer exactly — so the oracle is
  * the same brute-force all-pairs Jaccard definition q143 uses
  * (word tokens within language at J >= 19/20), and the gate proves the
  * incremental path loses nothing: same pairs whether the corpus
  * arrives at rest or one micro-batch at a time.
  *
  * Scale notes: this is NOT a stateful streaming aggregation — state is
  * the parquet prefix index/token store (partition-prunable, append
  * only), so there are no state-store commits to pin shuffle width for;
  * per-batch work is candidate-generation against Bloom-gated history,
  * never all-pairs. The 8-file replay (`maxFilesPerTrigger=1`) is the
  * bounded-stream analogue of a steady CDC feed.
  */
object DocSetSimStream {

  private val srcSchema = StructType(Seq(
    StructField("__id", LongType), StructField("__grp", StringType),
    StructField("__toks", ArrayType(StringType))))

  def q153StreamSetSim(s: SparkSession, d: String): DataFrame =
    Replay.run(s, Replay.Drain(
      tag = "q153",
      srcSchema = srcSchema,
      // replay source: the corpus tokenized once, split into 8 hash files
      // (deterministic membership; arrival order is irrelevant — the pair
      // sink converges to the same set for ANY batch split)
      writeSource = (ss, srcDir) =>
        Tables.documents(ss, d)
          .select(col("doc_id").as("__id"), col("lang").as("__grp"),
            array_distinct(split(col("text"), " ")).as("__toks"))
          .repartition(8, col("__id"))
          .write.mode("overwrite").parquet(srcDir),
      // fold under the BATCH's session (the micro-batch clone of the
      // drain session), so the operator sees the pinned confs; the
      // stream's batchId keys the state writes (replay idempotence)
      mkFold = (_, stateDir) => (batch, batchId) =>
        graft.operators.IncrementalSetSim.processBatch(
          batch.sparkSession, batch, stateDir, tNum = 19, tDen = 20,
          batchId = batchId),
      // deterministic (ia, ib) order without a range shuffle: the pair
      // sink is RESULT-sized, so a single-task sort replaces orderBy's
      // two-pass (boundary-sample + shuffle) shape for the presentation
      // sort — the operator itself never globally sorts
      readResult = (ss, stateDir) =>
        graft.operators.IncrementalSetSim.pairs(ss, stateDir)
          .coalesce(1).sortWithinPartitions("ia", "ib")))

  /** Identical to q143's oracle — the converged stream result must
    * equal the batch definition (that IS the claim under test).
    */
  val q153Sql: String =
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q153_stream_setsim" -> (q153StreamSetSim _))

  val oracles: Map[String, String] = Map(
    "q153_stream_setsim" -> q153Sql)
}
