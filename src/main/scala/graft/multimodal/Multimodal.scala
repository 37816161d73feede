package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing — images/audio/video as opaque `binary`
  * columns with typed metadata, processed partition-wise (the Scala
  * analogue of `mapInPandas` batch processing: one decoder instance per
  * partition, lazy iterator, no per-row setup cost).
  *
  * The actual media codecs are NOT in this container, so `decodeStub` is a
  * clearly-marked deterministic fake — but the Spark-side contract is real
  * and tested: schema (`binary` payload + struct metadata), partition-wise
  * batch shape, lazy iteration, and the frame-sampling explode. Swapping
  * `decodeStub` for a real decoder (javacv / ffmpeg bindings) changes no
  * plan shape.
  *
  * Scale notes: payload bytes travel through the plan exactly once (no
  * wide transform touches them); metadata extraction is a narrow
  * mapPartitions; frame sampling multiplies rows via a Generate (explode)
  * without copying the payload into each frame row.
  */
object Multimodal {

  /** Typed metadata the "decoder" yields per media blob. */
  final case class MediaMeta(
      doc_id: Long, n_bytes: Long, format: String, width: Int, height: Int)

  /** STUB decoder — deterministic fake standing in for an image/audio
    * decode (real codecs unavailable in this environment). Derives
    * pseudo-format/dimensions from (id, byte length) with plain integer
    * arithmetic so the whole pipeline is DuckDB-oracle-able end to end;
    * replace with a real decoder without touching any caller.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    val fmt = ((n + id) % 4L) match {
      case 0L => "png"; case 1L => "jpeg"; case 2L => "webp"; case _ => "gif"
    }
    MediaMeta(id, n, fmt,
      ((n * 31L + id * 7L) % 1024L + 1L).toInt,
      ((n * 131L + id * 13L) % 1024L + 1L).toInt)
  }

  /** A REAL (if minimal) decoder for the seam: parses the PNG signature
    * and IHDR chunk — 8-byte magic, then the 13-byte IHDR whose first
    * two big-endian u32s are width and height (PNG spec §11.2.2; public
    * format, no codec library needed). Exists to PROVE the decoder seam:
    * MultimodalStreamingSpec drops it into [[extractMeta]] in place of
    * [[decodeStub]] and asserts the physical plan is unchanged — the
    * claim "a real decoder swaps in without touching the plan" is
    * spec-backed, not scaladoc folklore.
    */
  def decodePngHeader(id: Long, bytes: Array[Byte]): MediaMeta = {
    val magic = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
    val isPng = bytes.length >= 24 &&
      magic.indices.forall(i => (bytes(i) & 0xFF) == magic(i))
    if (isPng) {
      def be32(o: Int): Int =
        ((bytes(o) & 0xFF) << 24) | ((bytes(o + 1) & 0xFF) << 16) |
          ((bytes(o + 2) & 0xFF) << 8) | (bytes(o + 3) & 0xFF)
      MediaMeta(id, bytes.length.toLong, "png", be32(16), be32(20))
    } else MediaMeta(id, bytes.length.toLong, "unknown", 0, 0)
  }

  /** Attach a synthetic binary payload to the documents table (UTF-8 bytes
    * of the text — a deterministic stand-in for real media ingestion).
    */
  def withPayload(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        col("text").cast("binary").as("payload"))

  /** Partition-wise metadata extraction (the mapInPandas-shaped step).
    * The decoder is the pluggable seam: any `(id, bytes) => MediaMeta`
    * rides the same narrow mapPartitions — same schema, same batch
    * shape, same physical plan (pinned by MultimodalStreamingSpec's
    * seam test with [[decodePngHeader]]).
    */
  def extractMeta(df: DataFrame,
      decoder: (Long, Array[Byte]) => MediaMeta = decodeStub _)
      : Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (one codec instance)
        it.map { case (id, bytes) => decoder(id, bytes) }
      }
  }

  /** Frame sampling: `n` evenly-spaced frame indices per media row,
    * exploded to one row per frame — payload is NOT duplicated; frames
    * carry (doc_id, frame_no, offset) for a downstream decode pass.
    */
  def frameSample(df: DataFrame, n: Int): DataFrame =
    df.select(col("doc_id"), length(col("payload")).as("n_bytes"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_no"))
      .withColumn("byte_offset",
        (col("frame_no") * col("n_bytes") / n).cast("long"))

  /** Driver-facing query: payload → partition-wise decode → metadata join
    * with frame sampling stats. Fully DuckDB-oracled: the stub's integer
    * arithmetic is restated over octet_length in SQL, so the hash check
    * covers the mapPartitions decode path, the frame-sampling Generate,
    * and the metadata join.
    */
  def q30Multimodal(s: SparkSession, d: String): DataFrame = {
    val payloads = withPayload(s, d)
    val meta = extractMeta(payloads).toDF()
    val frames = frameSample(payloads, 4)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"), max("byte_offset").as("last_offset"))
    meta.join(frames, "doc_id")
      .select("doc_id", "n_bytes", "format", "width", "height", "n_frames", "last_offset")
      .orderBy("doc_id")
  }

  val q30Sql: String =
    """WITH m AS (
      |  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents)
      |SELECT doc_id, n_bytes,
      |  CASE (n_bytes + doc_id) % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
      |       WHEN 2 THEN 'webp' ELSE 'gif' END AS format,
      |  CAST((n_bytes * 31 + doc_id * 7) % 1024 + 1 AS INT) AS width,
      |  CAST((n_bytes * 131 + doc_id * 13) % 1024 + 1 AS INT) AS height,
      |  CAST(4 AS BIGINT) AS n_frames,
      |  (3 * n_bytes) // 4 AS last_offset
      |FROM m ORDER BY doc_id""".stripMargin

  /** Perceptual-hash near-dup over the multimodal payload column — the
    * image-near-dup pipeline with the decode step stubbed (the dHash
    * "pixel stream" is the raw payload bytes; a real decoder swaps in
    * without touching anything downstream of the fingerprint).
    *
    * Shape: one narrow codegen pass computes a CONSTANT-SIZE 64-bit
    * fingerprint per payload (TextKernels.dhash64 — 65 equal-width byte
    * blocks, bit j = block j brighter than block j+1), then the EXACT
    * same machinery as q27: 4 × 16-bit hamming bands (pigeonhole — any
    * pair at hamming ≤ 3 collides on at least one band, recall 1 by
    * construction) with hot buckets sub-banded, never dropped
    * (Dedup.hammingBandPairs). Planted near-dups: every 10th payload
    * re-appears (id −doc_id−1) with its FIRST byte replaced — a
    * single-block perturbation that flips at most one fingerprint bit,
    * the byte-stream analogue of a small image retouch.
    *
    * 100 TB posture: payload bytes are touched exactly once (narrow
    * fingerprint projection, no shuffle carries the payload); everything
    * after it moves 8-byte hashes. Banding + sub-banding is the
    * candidate-generation design — never all-pairs.
    */
  /** The q152 corpus as (doc_id, ph) fingerprints: every payload plus a
    * planted first-byte-edited copy of each 10th one (id −doc_id−1) —
    * shared by the batch (q152) and streaming (q155) near-dup paths so
    * the cross-path equality claim compares the SAME input.
    */
  private[graft] def corpusFingerprints(s: SparkSession, d: String): DataFrame = {
    import graft.functions.text
    val base = withPayload(s, d).select(col("doc_id"), col("payload"))
    val planted = Tables.documents(s, d)
      .filter(col("doc_id") % 10 === 0)
      .select((-col("doc_id") - 1L).as("doc_id"),
        concat(lit("x"), expr("substring(text, 2)")).cast("binary").as("payload"))
    base.unionByName(planted)
      .select(col("doc_id"), text.dhash64(col("payload")).as("ph"))
  }

  /** 4 × 16-bit hamming band rows per fingerprint (pigeonhole: any pair
    * at hamming ≤ 3 agrees on at least one band) — q152/q155 banding.
    */
  private[graft] def phashBands(fp: DataFrame): DataFrame = {
    val bandStructs = array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("ph"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bucket"))
    }: _*)
    fp.select(col("doc_id"), col("ph"), explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("ph"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  def q152PhashNearDup(s: SparkSession, d: String): DataFrame = {
    import graft.functions.text
    val banded = phashBands(corpusFingerprints(s, d))
    graft.dedup.Dedup.hammingBandPairs(banded, "ph", maxBucket = 64)
      .withColumn("hamming", text.hamming64(col("pa"), col("pb")))
      .filter(col("hamming") <= 3)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** q152's oracle: recompute every dHash bit in SQL (per-block ord()
    * sums — byte == code point on this printable-ASCII corpus, and the
    * `f` CTE errors LOUDLY via octet_length(text) <> len(text) if a
    * future testdata change ever introduces a multi-byte character,
    * instead of surfacing as an opaque hash mismatch (r8 ADVICE) — with the
    * same cross-multiplied mean compare), then enumerate ALL pairs at
    * hamming ≤ 3. Banding recall is 1 by pigeonhole, so the bucketed
    * Spark plan must equal the all-pairs scan exactly (the q27 pattern).
    * COALESCE handles DuckDB's list_sum(NULL-on-empty) for payloads
    * shorter than 65 bytes.
    */
  val q152Sql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT -doc_id - 1, 'x' || text[2:] FROM documents
      |  WHERE doc_id % 10 = 0),
      |f AS (SELECT doc_id, text,
      |  len(text) + CASE WHEN octet_length(encode(text)) <> len(text)
      |    THEN error('q152 oracle requires an ASCII corpus: byte-hash != char-hash')
      |    ELSE 0 END AS n FROM corpus),
      |blocks AS (
      |  SELECT doc_id, b,
      |    COALESCE(list_sum(list_transform(
      |      range((b*n)//65 + 1, ((b+1)*n)//65 + 1),
      |      i -> ord(text[i:i]))), 0) AS s,
      |    ((b+1)*n)//65 - (b*n)//65 AS c
      |  FROM f CROSS JOIN (SELECT unnest(range(0, 65)) AS b)),
      |ph AS (
      |  SELECT x.doc_id,
      |    list(CASE WHEN x.s * y.c > y.s * x.c THEN 1 ELSE 0 END
      |         ORDER BY x.b) AS bits
      |  FROM blocks x JOIN blocks y ON x.doc_id = y.doc_id AND y.b = x.b + 1
      |  GROUP BY x.doc_id)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_filter(range(1, 65), i -> a.bits[i] != b.bits[i]))
      |    AS INT) AS hamming
      |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
      |WHERE len(list_filter(range(1, 65), i -> a.bits[i] != b.bits[i])) <= 3
      |ORDER BY id_a, id_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_multimodal" -> (q30Multimodal _),
    "q152_phash_neardup" -> (q152PhashNearDup _))

  val oracles: Map[String, String] = Map(
    "q30_multimodal" -> q30Sql,
    "q152_phash_neardup" -> q152Sql)
}
