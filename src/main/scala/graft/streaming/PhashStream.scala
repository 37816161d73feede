package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming image near-dup (q155): the q152 perceptual-hash corpus
  * replayed as a bounded micro-batch stream, each batch folded into an
  * append-only BANDED fingerprint index — the multimodal analogue of
  * q153's incremental set-similarity join (VERDICT r8 task 6: "close the
  * q152 ↔ q153 loop").
  *
  * Per arriving batch of (doc_id, ph) fingerprints:
  *  1. band the batch (4 × 16-bit bands, [[graft.multimodal.Multimodal
  *     .phashBands]] — the exact q152 banding);
  *  2. Bloom-gate the banded HISTORY by the batch's (band, bucket) keys
  *     (q88's gate as used by q153: filter built over the SMALL new
  *     side, probing the big history scan; skipped while the new side
  *     is within 2× of history, where selectivity ≈ 1 buys nothing);
  *  3. run [[graft.dedup.Dedup.hammingBandPairs]] — the SAME recall-1
  *     candidate machinery as batch q152, hot buckets sub-banded, leaf
  *     overflow loud — over (gated history ∪ batch), verify
  *     `hamming ≤ 3`;
  *  4. keep only pairs touching THIS batch's ids and append to the pair
  *     sink; then append the batch's band rows to the index.
  *
  * Exactly-once emission (q153's argument, fingerprint form): a pair is
  * emitted in the batch its LATER member arrives — history×history
  * pairs are filtered (they were emitted when their later member was
  * the batch), both-new pairs appear once (`id_a < id_b` normalized
  * inside hammingBandPairs), and the Bloom gate cannot lose a pair
  * (no false negatives; a qualifying pair shares a band bucket, and the
  * gate is keyed on exactly those buckets). So the pair-sink union over
  * ANY batch split converges to q152's batch answer row-for-row —
  * that equality IS the oracle claim, checked three ways: the DuckDB
  * all-pairs definition (driver gate), the q155 == q152 cross-path
  * compare (gate_sf01), and MultimodalStreamingSpec's in-suite check.
  *
  * Scale notes: state is a constant 8 bytes/doc × 4 band rows —
  * append-only parquet, partition-prunable by band at cluster scale;
  * per-batch work is arrival-rate × gated-bucket occupancy, never
  * all-pairs. Re-grouping gated history members each batch is the
  * bounded-replay trade (hammingBandPairs is battle-tested recall-1);
  * a production CDC sink would keep the per-cell member lists
  * materialized and merge instead of re-collecting.
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

  private def readOrEmpty(s: SparkSession, dir: String,
      schema: StructType): DataFrame =
    readFiles(s, listParquet(dir), schema)

  /** Explicit-path read — immune to re-listing, so a plan built on a
    * file-list SNAPSHOT can never see rows appended later in the same
    * batch (the q153 pinning rule that lets the state append run before
    * the pair job instead of after it).
    */
  private def readFiles(s: SparkSession, files: Seq[String],
      schema: StructType): DataFrame =
    if (files.nonEmpty) s.read.schema(schema).parquet(files: _*)
    else s.createDataFrame(s.sparkContext.emptyRDD[Row], schema)

  private def listParquet(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getPath).toSeq.sorted

  /** Fold one micro-batch of (doc_id, ph) into the banded index.
    *
    * Per-batch job budget (r10 — the q153 cost-cut pattern applied to
    * the phash sink; was persist+count, bloom build, pair write, state
    * append = 4+ jobs of mostly scheduling floor): snapshot the history
    * file list, APPEND the batch's band rows first, take the new row
    * count from the appended file's parquet FOOTER (zero jobs), then run
    * the pair job against the pinned pre-append history — 2 jobs per
    * batch in the steady replay (append + pairs), with the Bloom build
    * only arming once history is ~an order of magnitude past the
    * arrival rate (below that it prunes nothing on a banded index:
    * every batch touches most 16-bit buckets — same measured rationale
    * as q153's 8× disarm; the armed path is spec-covered with a skewed
    * split in MultimodalStreamingSpec).
    */
  def processBatch(s: SparkSession, batch: DataFrame,
      stateDir: String): Unit = {
    val fp = batch.select(col("doc_id"), col("ph"))
    // banding is 4 shift/mask projections over a one-file batch — cheap
    // enough to re-evaluate per consumer; a persist+count here cost a
    // whole job per batch
    val newBanded = graft.multimodal.Multimodal.phashBands(fp)
    val histCount = graft.operators.IncrementalSetSim.readMeta(stateDir)
    val bandedDir = s"$stateDir/banded"
    val before = listParquet(bandedDir)
    val hist = readFiles(s, before, bandedSchema)
    // one file per batch — arrival-rate-sized, the q123 compaction
    // posture; safe to run BEFORE the pair job because `hist` is pinned
    // to the pre-append file list above
    newBanded.coalesce(1).write.mode("append").parquet(bandedDir)
    val nNew = graft.operators.IncrementalSetSim.footerRows(s,
      listParquet(bandedDir).toSet -- before)
    // (band, bucket) packs into one long (bucket is 16 bits) — the
    // Bloom key valid on both build (new) and probe (history) sides
    val cellKey = col("bucket") * 4L + col("band")
    val gated =
      if (nNew == 0L || histCount == 0L) hist.limit(0)
      else if (nNew * 8 >= histCount) hist
      else hist.filter(
        graft.dedup.Dedup.bloomProbe(s, newBanded, cellKey, nNew))
    // the EXACT batch candidate machinery (recall 1 by pigeonhole, hot
    // buckets sub-banded, loud leaf overflow) over gated history ∪ new
    val pairs = graft.dedup.Dedup
      .hammingBandPairs(gated.unionByName(newBanded), "ph", maxBucket = 64)
      .withColumn("hamming",
        graft.functions.text.hamming64(col("pa"), col("pb")))
      .filter(col("hamming") <= 3)
    // exactly-once: only pairs touching THIS batch's ids (history×
    // history pairs re-found by the union were emitted in the batch
    // their later member arrived). Arrival-rate-bounded broadcast;
    // the OR-condition semi-join is a BNL over a tiny build side.
    val newIds = fp.select(col("doc_id").as("nid"))
    pairs.join(broadcast(newIds),
        col("id_a") === col("nid") || col("id_b") === col("nid"),
        "left_semi")
      .select(col("id_a"), col("id_b"), col("hamming").cast("int"))
      .write.mode("append").parquet(s"$stateDir/pairs")
    graft.operators.IncrementalSetSim.writeMeta(stateDir, histCount + nNew)
  }

  def q155StreamPhash(s: SparkSession, d: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_q155_")
    val srcDir = s"$tmp/src"
    val stateDir = s"$tmp/state"
    // isolated session + narrow width + AQE off: the q153 drain posture
    // (bounded replay of small per-batch jobs is scheduling-dominated;
    // conf pins must not leak to concurrent suites)
    val ss = s.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    ss.conf.set("spark.sql.adaptive.enabled", "false")
    graft.multimodal.Multimodal.corpusFingerprints(ss, d)
      .repartition(8, col("doc_id"))
      .write.mode("overwrite").parquet(srcDir)
    val fold: (Dataset[Row], Long) => Unit = (batch, _) =>
      processBatch(batch.sparkSession, batch, stateDir)
    val q = ss.readStream.schema(srcSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch(fold)
      .start()
    try q.processAllAvailable() finally q.stop()
    // materialize off the temp state, then delete the working set
    // (the q153 lifecycle-hygiene rule: no leaked /tmp corpora)
    val out = readOrEmpty(ss, s"$stateDir/pairs", pairsSchema)
      .orderBy("id_a", "id_b").localCheckpoint(true)
    DocSetSimStream.deleteRecursively(tmp)
    out
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q155_stream_phash" -> (q155StreamPhash _))

  /** Identical to q152's oracle — the converged stream result must equal
    * the batch perceptual-hash answer (that IS the claim under test).
    */
  val oracles: Map[String, String] = Map(
    "q155_stream_phash" -> graft.multimodal.Multimodal.q152Sql)
}
