package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming exact shared-span excision (q228): the q220 corpus
  * replayed as bounded micro-batches, each batch folded into an
  * append-only W20 WINDOW-OCCURRENCE index — the ExactSubstr analogue
  * of q153's incremental set-similarity join and q155's fingerprint
  * index. Converges to q220's batch answer EXACTLY, under any batch
  * split and any arrival order, because coverage events are emitted in
  * BOTH directions the moment the deciding pair of occurrences has
  * both arrived:
  *
  *  - FORWARD: an arriving doc's window is covered when the history
  *    index already holds the value under a smaller doc id;
  *  - WITHIN-BATCH: or when a batch-mate with smaller id carries it
  *    (the batch-local min per value — q220's reduction one batch at a
  *    time);
  *  - BACKWARD: and an arriving doc RETROACTIVELY covers history
  *    occurrences of the same value in docs with LARGER ids (a
  *    later-arriving earlier document must excise spans the stream
  *    already indexed — without this leg the stream would be
  *    arrival-order-dependent, which no replay contract can promise).
  *
  * The union of events over any drain is therefore exactly "position p
  * of doc x lies in a MinSpan window whose value occurs in SOME doc
  * < x" — the W20 reduction (see Dedup.q220SpanScrub for the proof it
  * equals the diagonal-run semantics), so the final scrub restates
  * q220 row for row and the DuckDB oracle IS q220's. Duplicate events
  * (the same position re-covered by later batches) collapse in the
  * readResult distinct — events are facts, re-stating one is harmless,
  * which is also what makes at-least-once replay safe on top of the
  * (state, batchId) txn no-op contract.
  *
  * State carries 96-bit window hashes, doc ids and positions — never
  * text (the q218/q220 r18 posture; exactness is certified here by the
  * oracle equality itself plus the gate's cross-path compare, rather
  * than per-window string slices — the streaming state holding no
  * strings is the point). Per-batch cost: one columnar history scan +
  * two broadcast probes of the arrival-rate-sized batch aggregate; at
  * cluster scale the index partitions by hash range so the probes
  * prune to touched values. Scrub assembly happens ONCE at drain end,
  * not per batch.
  */
object SpanStream {

  private val MinSpan = 20

  private val srcSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private val winSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("pos", IntegerType),
    StructField("h", LongType), StructField("v", IntegerType)))

  private val covSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("start", IntegerType)))

  /** W20 windows of a (doc_id, text) frame — hash pair only. */
  private def windows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), posexplode_outer(expr(
        s"""CASE WHEN size(t) >= $MinSpan
           |THEN transform(sequence(1, size(t) - ${MinSpan - 1}),
           |  i -> struct(xxhash64(slice(t, i, $MinSpan)) AS h,
           |              hash(slice(t, i, $MinSpan)) AS v))
           |ELSE array() END""".stripMargin)))
      .filter(col("col").isNotNull)
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("pos"),
        col("col.h").as("h"), col("col.v").as("v"))

  def processBatch(s: SparkSession, batch: DataFrame,
      stateDir: String, batchId: Long): Unit = {
    val newW = windows(batch).localCheckpoint(true)
    val winDir = s"$stateDir/windows"
    val covDir = s"$stateDir/covered"
    // history pinned strictly below this batch (replay idempotence via
    // manifest time travel), THEN the batch's own rows commit
    val hist = TxState.readBefore(s, winDir, winSchema, batchId)
    TxState.writeBatch(newW, winDir, batchId)
    // batch-local min occurrence per value — arrival-rate-sized, the
    // broadcast side of both probes
    val batchMin = newW.groupBy(col("h").as("mh"), col("v").as("mv"))
      .agg(min("doc_id").as("m"))
    // forward: batch occurrences covered by the history index
    val histMin = hist.groupBy(col("h").as("hh"), col("v").as("hv"))
      .agg(min("doc_id").as("hm"))
    val fwd = newW.join(histMin,
        col("h") === col("hh") && col("v") === col("hv") &&
          col("hm") < col("doc_id"))
      .select(col("doc_id"), col("pos").as("start"))
    // within-batch: covered by a smaller batch-mate
    val within = newW.join(broadcast(batchMin),
        col("h") === col("mh") && col("v") === col("mv") &&
          col("m") < col("doc_id"))
      .select(col("doc_id"), col("pos").as("start"))
    // backward: history occurrences retroactively covered by an
    // arriving smaller doc
    val back = hist.join(broadcast(batchMin),
        col("h") === col("mh") && col("v") === col("mv") &&
          col("m") < col("doc_id"))
      .select(col("doc_id"), col("pos").as("start"))
    TxState.writeBatch(fwd.unionByName(within).unionByName(back)
      .dropDuplicates("doc_id", "start"), covDir, batchId)
  }

  def q228StreamSpanScrub(s: SparkSession, d: String): DataFrame =
    Replay.run(s, Replay.Drain(
      tag = "q228",
      srcSchema = srcSchema,
      writeSource = (ss, srcDir) =>
        graft.Tables.documents(ss, d).select("doc_id", "text")
          .repartition(8, col("doc_id"))
          .write.mode("overwrite").parquet(srcDir),
      mkFold = (_, stateDir) => (batch, batchId) =>
        processBatch(batch.sparkSession, batch, stateDir, batchId),
      readResult = (ss, stateDir) => {
        // drain-end scrub assembly — q220's tail over the accumulated
        // coverage events (distinct: re-stated facts collapse)
        val certified = TxState.readBefore(ss, s"$stateDir/covered",
          covSchema).dropDuplicates("doc_id", "start")
        val toks = graft.Tables.documents(ss, d)
          .select(col("doc_id"), split(col("text"), " ").as("t"))
          .select(col("doc_id"), size(col("t")).as("n_tokens"),
            posexplode_outer(col("t")))
          .select(col("doc_id"), col("n_tokens"),
            (col("pos") + 1).as("p"), col("col").as("tok"))
        val covered = toks.join(certified, Seq("doc_id"))
          .filter(col("p") >= col("start") &&
            col("p") < col("start") + MinSpan)
          .select("doc_id", "p").distinct()
        val kept = toks.join(covered, Seq("doc_id", "p"), "left_anti")
        val keptAgg = kept.groupBy("doc_id")
          .agg(concat_ws(" ", transform(array_sort(
            collect_list(struct(col("p"), col("tok")))), x => x("tok")))
            .as("scrubbed_raw"))
        val affected = covered.groupBy("doc_id")
          .agg(count(lit(1)).as("n_removed"))
        val base = graft.Tables.documents(ss, d)
          .select(col("doc_id"),
            size(split(col("text"), " ")).as("n_tokens"))
        affected.join(base, Seq("doc_id"))
          .join(keptAgg, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_tokens"), col("n_removed"),
            coalesce(col("scrubbed_raw"), lit("")).as("scrubbed"))
          .orderBy("doc_id")
      }))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q228_stream_spanscrub" -> (q228StreamSpanScrub _))

  /** Identical to q220's oracle — the converged stream result must
    * equal the batch excision answer (that IS the claim under test).
    */
  val oracles: Map[String, String] = Map(
    "q228_stream_spanscrub" -> graft.dedup.Dedup.q220Sql)
}
