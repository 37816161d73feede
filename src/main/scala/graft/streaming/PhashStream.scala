package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming image near-dup (q155): the q152 perceptual-hash corpus
  * replayed as a bounded micro-batch stream, each batch folded into an
  * append-only BANDED fingerprint index — the multimodal analogue of
  * q153's incremental set-similarity join.
  *
  * Per arriving batch of (doc_id, ph) fingerprints:
  *  1. band the batch (4 × 16-bit bands, [[graft.multimodal.Multimodal
  *     .phashBands]] — the exact q152 banding);
  *  2. within-batch pairs: [[graft.dedup.Dedup.hammingBandPairs]] over
  *     the batch alone (arrival-rate-sized — the sub-banding/overflow
  *     machinery only matters for a pathologically hot batch);
  *  3. batch×history pairs: the batch's band rows BROADCAST-probe the
  *     banded history on the exact (band, bucket) key. Recall is 1 by
  *     the same pigeonhole as q152 (hamming ≤ 3 over 4 bands leaves ≥ 1
  *     band intact, and that band's cell is an exact join key);
  *  4. verify `hamming ≤ 3`, dedupe multi-band matches, and write the
  *     batch's pairs and band rows under batch-keyed state dirs.
  *
  * r10 VERDICT task 2 asked for the per-batch `hammingBandPairs` re-group
  * over gated history (group + collect members per cell, every batch) to
  * be replaced by MAINTAINED per-cell member lists. The join probe above
  * is that fix taken one step further: the banded index rows ARE the
  * member lists, stored row-wise on their cell key, and a broadcast hash
  * join evaluates exactly the "new member × cell members" products a
  * list-merge would — with no collect_list, no shuffle over history, and
  * no state rewrite (the index stays append-only, which is what makes
  * the batch-keyed idempotence contract possible). Per-batch history
  * cost is one narrow columnar scan + a hash probe per row; the former
  * Bloom gate is gone because a Bloom test before a broadcast hash join
  * is the same hash probe twice (the gate existed to keep non-matching
  * history OUT OF the group-by shuffle — there is no shuffle now). At
  * cluster scale the index is partitioned by band/bucket range, so the
  * scan itself prunes to the cells the batch touches.
  *
  * Exactly-once emission (q153's argument, fingerprint form): a pair is
  * emitted in the batch its LATER member arrives — within-batch pairs
  * once (`id_a < id_b` normalized), batch×history pairs exist in one
  * direction only — so the pair-sink union over ANY batch split
  * converges to q152's batch answer row-for-row. That equality IS the
  * oracle claim, checked three ways: the DuckDB all-pairs definition
  * (driver gate), the q155 == q152 cross-path compare (gate_sf01), and
  * MultimodalStreamingSpec's in-suite check. Unlike r10, the claim now
  * survives at-least-once replay — and since r12 the mechanism is the
  * transactional manifest itself ([[TxState]] on
  * [[graft.operators.TxTable]]): each batch commits under a (state,
  * batchId) txn so a replay whose first attempt landed no-ops, and
  * history reads time-travel to the newest snapshot strictly below the
  * batch (ReplayIdempotenceSpec, including the crash-between-commits
  * case).
  *
  * Scale notes: state is a constant 8 bytes/doc × 4 band rows —
  * append-only parquet, partition-prunable by band at cluster scale,
  * compactable between drains ([[TxState.compact]] = committed OPTIMIZE
  * + retention vacuum); per-batch work is arrival-rate × touched-cell
  * occupancy, never all-pairs.
  */
object PhashStream {

  private val srcSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("ph", LongType)))

  private val bandedSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("ph", LongType),
    StructField("band", IntegerType), StructField("bucket", LongType)))

  private val pairsSchema = StructType(Seq(
    StructField("id_a", LongType), StructField("id_b", LongType),
    StructField("hamming", IntegerType)))

  /** Fold one micro-batch of (doc_id, ph) into the banded index.
    *
    * Per-batch job budget: band-rows write + one pair job (the history
    * probe and within-batch pairs meet in the same DAG) — 2 jobs in the
    * steady replay, nothing driver-side but parquet-footer metadata.
    */
  def processBatch(s: SparkSession, batch: DataFrame,
      stateDir: String, batchId: Long): Unit = {
    val fp = batch.select(col("doc_id"), col("ph"))
    // banding is 4 shift/mask projections over a one-file batch — cheap
    // enough to re-evaluate per consumer; a persist+count here cost a
    // whole job per batch
    val newBanded = graft.multimodal.Multimodal.phashBands(fp)
    val bandedDir = s"$stateDir/banded"
    // history pinned to strictly-earlier batches via manifest time travel
    // (idempotence: a replay reads exactly what its first attempt saw,
    // even when that attempt's commit landed), then the batch's own band
    // rows commit under the (state, batchId) txn — a replay no-ops
    val hist = TxState.readBefore(s, bandedDir, bandedSchema, batchId)
    TxState.writeBatch(newBanded, bandedDir, batchId)
    // within-batch pairs: the battle-tested q152 machinery on the batch
    // alone (id_a < id_b normalized inside)
    val newNew = graft.dedup.Dedup
      .hammingBandPairs(newBanded, "ph", maxBucket = 64)
      .select(col("id_a"), col("id_b"),
        graft.functions.text.hamming64(col("pa"), col("pb")).as("hamming"))
    // batch×history pairs: broadcast the arrival-rate-sized batch band
    // rows onto the history scan — exact cell key, so the probe IS the
    // candidate generation (see class doc for why this replaced the
    // gated re-group)
    val newSide = newBanded.select(col("doc_id").as("id_n"),
      col("ph").as("ph_n"), col("band"), col("bucket"))
    val newOld = hist.join(broadcast(newSide), Seq("band", "bucket"))
      .filter(col("doc_id") =!= col("id_n"))
      .select(least(col("doc_id"), col("id_n")).as("id_a"),
        greatest(col("doc_id"), col("id_n")).as("id_b"),
        graft.functions.text.hamming64(col("ph"), col("ph_n")).as("hamming"))
    val pairs = newNew.unionByName(newOld)
      .filter(col("hamming") <= 3)
      // a qualifying pair can share several intact bands — dedupe on the
      // RESULT-sized set (hamming is a function of the pair, so any row
      // kept is the right one)
      .dropDuplicates("id_a", "id_b")
      .select(col("id_a"), col("id_b"), col("hamming").cast("int"))
    TxState.writeBatch(pairs, s"$stateDir/pairs", batchId)
  }

  def q155StreamPhash(s: SparkSession, d: String): DataFrame =
    Replay.run(s, Replay.Drain(
      tag = "q155",
      srcSchema = srcSchema,
      writeSource = (ss, srcDir) =>
        graft.multimodal.Multimodal.corpusFingerprints(ss, d)
          .repartition(8, col("doc_id"))
          .write.mode("overwrite").parquet(srcDir),
      mkFold = (_, stateDir) => (batch, batchId) =>
        processBatch(batch.sparkSession, batch, stateDir, batchId),
      readResult = (ss, stateDir) =>
        TxState.readBefore(ss, s"$stateDir/pairs", pairsSchema)
          .orderBy("id_a", "id_b")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q155_stream_phash" -> (q155StreamPhash _))

  /** Identical to q152's oracle — the converged stream result must equal
    * the batch perceptual-hash answer (that IS the claim under test).
    */
  val oracles: Map[String, String] = Map(
    "q155_stream_phash" -> graft.multimodal.Multimodal.q152Sql)
}
