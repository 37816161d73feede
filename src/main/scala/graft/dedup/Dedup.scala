package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.text

/** Deduplication surface over the `documents` table — exact (hash-groupBy),
  * MinHash+LSH near-dup (shingle → signature → band → bucket-join), SimHash
  * hamming candidates, and exact n-gram Jaccard verification.
  *
  * Scale design (the whole point at 100 TB):
  *   - signatures/simhashes are computed in ONE narrow pass (custom codegen
  *     Expressions, no UDF boxing) — cost O(corpus) with zero shuffle;
  *   - LSH banding turns the O(n²) pair problem into groupBy(band, bucket):
  *     one shuffle keyed on (band, bucket-hash), with pairs enumerated only
  *     inside buckets (collision sets), never across the corpus;
  *   - the exact-Jaccard verify joins texts back ONLY for candidate pairs
  *     (a tiny fraction of the corpus), so the expensive comparison is
  *     bounded by candidate volume, not corpus size;
  *   - skew guard: buckets larger than `maxBucket` are dropped (standard
  *     LSH practice — a degenerate bucket means the band hash collapsed,
  *     e.g. empty docs; enumerating its pairs is O(bucket²) poison).
  */
object Dedup {

  /** Exact dedup via content-hash groupBy: one shuffle on md5(text),
    * keeps the lowest doc_id per content group.
    */
  def q25ExactDedup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")

  val q25Sql: String =
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
      |  COUNT(*) AS n_copies
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** Synthetic near-dup corpus: every 10th document re-appears with its
    * last two tokens dropped — gives the LSH pipeline known positives to
    * find, deterministically, at any SF. Planted copies get id
    * `-doc_id - 1`: genuine doc_ids are non-negative, so the marker range
    * can never collide with a real id regardless of corpus size (a fixed
    * `+1e6` offset would alias once the table passes a million rows).
    */
  private[graft] def corpusWithNearDups(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val mutated = Tables.documents(s, d)
      .filter(col("doc_id") % 10 === 0)
      .select((-col("doc_id") - 1L).as("doc_id"),
        regexp_replace(col("text"), "\\s+\\S+\\s+\\S+\\s*$", "").as("text"))
    docs.unionByName(mutated)
  }

  val NumHashes = 64
  val Bands = 8
  val RowsPerBand = NumHashes / Bands

  /** In-bucket ordered-pair expansion: members sorted by doc_id so pair
    * (i < j) gives id_a < id_b; cross-band duplicates collapsed. `payload`
    * rides along (signature / simhash) for downstream verification.
    *
    * The `maxBucket` DROP below is correct ONLY under a probabilistic-
    * recall contract (q26's MinHash banding, q33's SRP banding — recall is
    * corpus-statistical to begin with, and the drop is asserted harmless
    * at the gate SF). A CONSTRUCTION-EXACT recall guarantee (q27's
    * pigeonhole banding) must never drop a hot bucket — hot buckets are
    * where near-dups concentrate; use [[hammingBandPairs]], which
    * sub-bands them instead (the old drop silently halved q27's sf0.1
    * answer for four rounds). Do not copy this drop into a
    * deterministic-recall context.
    */
  private def bucketPairs(banded: DataFrame, payload: String,
      maxBucket: Int): DataFrame =
    banded.groupBy("band", "bucket")
      .agg(array_sort(collect_list(struct(col("doc_id"), col(payload)))).as("m"))
      .filter(size(col("m")).between(2, maxBucket)) // skew guard
      // explode_outer: the skew guard already proves the pair array is
      // non-empty, so InferFiltersFromGenerate's size(...)>0 filter would
      // only re-evaluate the whole pair-expansion lambda a second time
      // per bucket (see CLAUDE.md rule)
      .select(explode_outer(expr(
        s"""flatten(transform(m, (x, i) ->
           |  transform(slice(m, i + 2, size(m)), y ->
           |    struct(x.doc_id AS id_a, y.doc_id AS id_b,
           |           x.$payload AS pa, y.$payload AS pb))))""".stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.pa").as("pa"), col("p.pb").as("pb"))
      .dropDuplicates("id_a", "id_b")

  /** Hamming-banded candidate pairs with RECURSIVE SUB-BANDING instead of
    * a drop for hot buckets — the exact-recall guard q27's pigeonhole
    * argument needs as the corpus grows.
    *
    * Level 1 is the usual 4 × 16-bit banding over a 64-bit signature:
    * hamming ≤ 3 forces at least one identical band. A bucket whose
    * membership exceeds `maxBucket` is NOT dropped (that is q26's
    * corpus-probabilistic posture; here it silently halved the sf0.1
    * answer — hot buckets are exactly where the near-dups live): its
    * members agree on the bucket's 16 bits, so any qualifying pair's ≤ 3
    * differing bits lie in the remaining 48 — pigeonhole again over
    * 4 × 12-bit sub-bands of those 48 bits, enumerating pairs inside
    * (band, bucket, sub-band, sub-value) cells. A level-2 cell that
    * STILL exceeds `leafCap` pigeonholes once more (its members agree on
    * 16 + 12 bits; the ≤ 3 diffs lie in the remaining 36 → 4 × 9-bit
    * sub-sub-bands). A level-3 cell over `leafCap` — ≥ `leafCap` docs
    * agreeing on 37 signature bits — is a near-identical clique whose
    * PAIR OUTPUT is inherently quadratic; rather than silently losing
    * its pairs (the failure class this operator exists to prevent) the
    * plan FAILS LOUDLY via `assert_true`, naming the cluster operator
    * (q71) as the right tool at that density. So: recall is 1 by
    * construction whenever the operator returns; overflow is an error,
    * never a silent drop.
    */
  private[graft] def hammingBandPairs(banded: DataFrame, payload: String,
      maxBucket: Int, leafCap: Int = 4096): DataFrame = {
    val grouped = banded.groupBy("band", "bucket")
      .agg(array_sort(collect_list(struct(col("doc_id"), col(payload)))).as("m"))
    val cold = grouped.filter(size(col("m")).between(2, maxBucket))
    val hotMembers = grouped.filter(size(col("m")) > maxBucket)
      .select(col("band"), col("bucket"), explode_outer(col("m")).as("x"))
      .select(col("band"), col("bucket"), col("x.doc_id").as("doc_id"),
        col("x").getField(payload).as(payload))
      // the 48 bits outside this band, packed contiguously (SQL shift
      // operators accept expression shift amounts; the Column API does not)
      .withColumn("__rem", expr(
        s"""shiftleft(shiftright($payload, (band + 1) * 16), band * 16) |
           |($payload & (shiftleft(CAST(1 AS BIGINT), band * 16) - 1))""".stripMargin))
    val subBands = array((0 until 4).map { j =>
      struct(lit(j).as("sband"),
        shiftright(col("__rem"), j * 12).bitwiseAND(lit(0xFFFL)).as("sbucket"))
    }: _*)
    // level 2: __rem rides inside the member struct so an over-cap cell
    // can be re-subdivided without recomputing the packed remainder
    val l2 = hotMembers
      .select(col("band"), col("bucket"), col("doc_id"), col(payload),
        col("__rem"), explode(subBands).as("sb"))
      .groupBy(col("band"), col("bucket"), col("sb.sband").as("sband"),
        col("sb.sbucket").as("sbucket"))
      .agg(array_sort(collect_list(
        struct(col("doc_id"), col(payload), col("__rem")))).as("m"))
    val hot = l2.filter(size(col("m")).between(2, leafCap)).select(col("m"))
    // level 3: over-cap level-2 cells agree on the sub-band's 12 bits
    // too — pigeonhole the remaining 36 bits into 4 × 9-bit cells
    val l3Members = l2.filter(size(col("m")) > leafCap)
      .select(col("band"), col("bucket"), col("sband"), col("sbucket"),
        explode_outer(col("m")).as("x"))
      .select(col("band"), col("bucket"), col("sband"), col("sbucket"),
        col("x.doc_id").as("doc_id"), col("x").getField(payload).as(payload),
        expr(
          s"""shiftleft(shiftright(x.__rem, (sband + 1) * 12), sband * 12) |
             |(x.__rem & (shiftleft(CAST(1 AS BIGINT), sband * 12) - 1))"""
            .stripMargin).as("__rem2"))
    val subSubBands = array((0 until 4).map { j =>
      struct(lit(j).as("ssband"),
        shiftright(col("__rem2"), j * 9).bitwiseAND(lit(0x1FFL)).as("ssbucket"))
    }: _*)
    val leaf = l3Members
      .select(col("band"), col("bucket"), col("sband"), col("sbucket"),
        col("doc_id"), col(payload), explode(subSubBands).as("ssb"))
      .groupBy(col("band"), col("bucket"), col("sband"), col("sbucket"),
        col("ssb.ssband").as("ssband"), col("ssb.ssbucket").as("ssbucket"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col(payload)))).as("m"))
      .filter(size(col("m")) >= 2)
      // loud-failure guard: assert_true throws (with the message) on the
      // first over-cap leaf instead of silently dropping its pairs
      .where(assert_true(size(col("m")) <= leafCap, lit(
        s"hammingBandPairs: a leaf cell exceeded leafCap=$leafCap — " +
          ">leafCap signatures agree on 37 bits; the pair list is " +
          "inherently quadratic here. Use the connected-components " +
          "cluster operator (Clusters.connectedComponents / q71) for " +
          "this corpus density.")).isNull)
      .select(col("m"))
    def expand(buckets: DataFrame): DataFrame = buckets
      .select(explode_outer(expr(
        s"""flatten(transform(m, (x, i) ->
           |  transform(slice(m, i + 2, size(m)), y ->
           |    struct(x.doc_id AS id_a, y.doc_id AS id_b,
           |           x.$payload AS pa, y.$payload AS pb))))""".stripMargin)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.pa").as("pa"), col("p.pb").as("pb"))
    expand(cold.select(col("m"))).unionByName(expand(hot))
      .unionByName(expand(leaf))
      .dropDuplicates("id_a", "id_b")
  }

  /** MinHash → LSH banding → in-bucket candidate pairs → MinHash-estimated
    * and exact n-gram Jaccard for each candidate.
    */
  def nearDupPairs(corpus: DataFrame, minJaccard: Double = 0.5,
      maxBucket: Int = 64): DataFrame = {
    val sig = corpus.select(
      col("doc_id"), col("text"),
      text.minhash_signature(col("text"), shingle = 3, num = NumHashes).as("sig"))

    // band rows: (band, bucket = xxhash of the band's signature slice)
    val bandStructs = array((0 until Bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(lit(b), slice(col("sig"), b * RowsPerBand + 1, RowsPerBand)).as("bucket"))
    }: _*)
    val banded = sig
      .select(col("doc_id"), col("sig"), explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    // ONE aggregation enumerates in-bucket pairs: collect members per
    // (band, bucket) — bounded by the skew guard, so collect_list is safe —
    // then expand ordered pairs with array lambdas. This replaces a
    // bucket-self-join that would recompute the entire signature pipeline
    // for both sides (2× corpus scans + an extra shuffle).
    val candidates = bucketPairs(banded, "sig", maxBucket)
      .withColumnRenamed("pa", "sig_a").withColumnRenamed("pb", "sig_b")

    val estJaccard = round(
      aggregate(
        zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("double") / NumHashes, 4)

    // exact verify: join texts back only for candidates
    val shingles = corpus.select(col("doc_id"),
      text.shingle_hashes(col("text"), shingle = 3).as("sh"))
    val exactJaccard = round(
      size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))), 4)

    candidates
      .withColumn("est_jaccard", estJaccard)
      .drop("sig_a", "sig_b")
      .join(shingles.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(shingles.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("exact_jaccard", exactJaccard)
      .drop("sh_a", "sh_b")
      .filter(col("exact_jaccard") >= minJaccard)
  }

  /** q26's driver surface: the DECISION columns (pair ids + exact
    * Jaccard). The MinHash estimate rides inside [[nearDupPairs]] (and is
    * spec-verified for recall in DedupKnnSpec) but is built from custom
    * 64-bit hashes with no SQL twin, so the driver projection keeps to
    * what DuckDB can recompute: documents are single-space tokenized, so
    * the hashed-shingle identity (raw substring spanning the 3 tokens,
    * TextKernels.shingleHashes) equals the space-joined token triple, and
    * exact Jaccard over the hash sets equals Jaccard over the string sets.
    * The oracle enumerates ALL >= 0.5 pairs; verified at sf0.01 the LSH
    * candidate stage has recall 1 there (81 = 81 pairs), which is what
    * makes the full query — not just the verify stage — hash-comparable.
    */
  def q26NearDupPairs(s: SparkSession, d: String): DataFrame =
    nearDupPairs(corpusWithNearDups(s, d))
      .select("id_a", "id_b", "exact_jaccard")
      .orderBy("id_a", "id_b")

  /** All-pairs exact shingle Jaccard in SQL (the oracle only runs at the
    * driver's small SF; the Spark side stays LSH-bucketed — that asymmetry
    * is the point: same answer, scalable plan).
    */
  val q26Sql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT -doc_id - 1, regexp_replace(text, '\s+\S+\s+\S+\s*$', '')
      |  FROM documents WHERE doc_id % 10 = 0),
      |sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      range(1, len(regexp_extract_all(text, '\S+')) - 1),
      |      i -> regexp_extract_all(text, '\S+')[i] || ' ' ||
      |           regexp_extract_all(text, '\S+')[i+1] || ' ' ||
      |           regexp_extract_all(text, '\S+')[i+2])) AS grams
      |  FROM corpus),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
      |          len(list_distinct(list_concat(a.grams, b.grams))), 4)
      |      AS exact_jaccard
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |SELECT * FROM pairs WHERE exact_jaccard >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  /** SimHash near-dup candidates over the same synthetic corpus: bucket by
    * 4 × 16-bit bands, verify with full hamming distance — FULLY ORACLED
    * since round 4. Two facts make the oracle exact, not statistical:
    * (1) the token hash is md5_number_lower (TextKernels.simhashMd5), so
    * DuckDB recomputes every simhash bit from the tokens; (2) pigeonhole —
    * hamming ≤ 3 over 4 disjoint 16-bit bands forces at least one band
    * identical, so banding recall is 1 by CONSTRUCTION (unlike q26's
    * corpus-dependent MinHash recall), and since round 7 that guarantee
    * survives hot buckets: [[hammingBandPairs]] sub-bands an over-cap
    * bucket's remaining 48 bits (pigeonhole again) instead of dropping it
    * — the old drop silently halved the sf0.1 answer while the gate SF
    * stayed green (max gate bucket 44 of 64). The FNV-hashed simhash64
    * remains the throughput default.
    */
  def q27SimhashPairs(s: SparkSession, d: String): DataFrame = {
    val corpus = corpusWithNearDups(s, d)
    val hashed = corpus.select(col("doc_id"),
      text.simhash_md5(col("text")).as("sh"))
    val bandStructs = array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bucket"))
    }: _*)
    val banded = hashed.select(col("doc_id"), col("sh"),
      explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    hammingBandPairs(banded, "sh", maxBucket = 64)
      .withColumn("hamming", text.hamming64(col("pa"), col("pb")))
      .filter(col("hamming") <= 3)
      .select("id_a", "id_b", "hamming")
      .orderBy("id_a", "id_b")
  }

  /** q27's oracle: recompute every simhash bit in SQL (per-token
    * md5_number_lower, ±1 vote per bit, bit = tally > 0), then enumerate
    * ALL pairs at hamming ≤ 3. The Spark side's banding is exact for this
    * cutoff by pigeonhole (see [[q27SimhashPairs]]), so candidate
    * generation drops nothing the all-pairs scan finds — guaranteed by
    * [[hammingBandPairs]] whenever it returns (hot buckets sub-band up to
    * two extra pigeonhole levels instead of dropping — the old maxBucket
    * drop silently halved the sf0.1 answer — and a still-over-cap leaf
    * FAILS LOUDLY rather than losing pairs). The oracle only runs at the
    * driver's small SF; the Spark plan stays LSH-bucketed.
    */
  val q27Sql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT -doc_id - 1, regexp_replace(text, '\s+\S+\s+\S+\s*$', '')
      |  FROM documents WHERE doc_id % 10 = 0),
      |tk AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
      |  FROM corpus),
      |bits AS (
      |  SELECT doc_id, j,
      |    SUM(CASE WHEN (md5_number_lower(tok) >> j) & 1 = 1
      |        THEN 1 ELSE -1 END) AS vote
      |  FROM tk CROSS JOIN (SELECT unnest(range(0, 64)) AS j)
      |  GROUP BY doc_id, j),
      |sh AS (
      |  SELECT doc_id,
      |    list(CASE WHEN vote > 0 THEN 1 ELSE 0 END ORDER BY j) AS b
      |  FROM bits GROUP BY doc_id)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_filter(range(1, 65), i -> a.b[i] != b.b[i])) AS INT)
      |    AS hamming
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE len(list_filter(range(1, 65), i -> a.b[i] != b.b[i])) <= 3
      |ORDER BY id_a, id_b""".stripMargin

  /** Embedding-cosine near-dup: SRP-LSH signatures (64 bits, 4 × 16-bit
    * bands) bucket cosine-similar vectors; exact cosine verifies in-bucket
    * candidates. Planted positives: every 20th vector re-appears scaled
    * ×1.0001 (cosine 1.0, signature identical — same mechanism a real
    * pipeline uses to catch re-encoded duplicates). Planted ids are
    * `-vec_id - 1` — collision-free against non-negative genuine ids at
    * any scale (see [[corpusWithNearDups]]).
    */
  def q33EmbeddingNearDup(s: SparkSession, d: String): DataFrame = {
    import graft.functions.vectors
    val emb = Tables.embeddings(s, d).select(
      col("vec_id").as("doc_id"), col("embedding"))
    val planted = Tables.embeddings(s, d)
      .filter(col("vec_id") % 20 === 0)
      .select((-col("vec_id") - 1L).as("doc_id"),
        transform(col("embedding"), x => x * lit(1.0001f)).as("embedding"))
    val corpus = emb.unionByName(planted)
    val sig = corpus.select(col("doc_id"), col("embedding"),
      vectors.srp_signature(col("embedding"), bits = 64).as("sig"))
    val bandStructs = array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bucket"))
    }: _*)
    val banded = sig.select(col("doc_id"), col("embedding"),
        explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("embedding"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    bucketPairs(banded, "embedding", maxBucket = 64)
      .withColumn("cos_sim",
        round(vectors.cosine_similarity(col("pa"), col("pb")), 6))
      .filter(col("cos_sim") >= 0.9)
      .select("id_a", "id_b", "cos_sim")
      .orderBy("id_a", "id_b")
  }

  /** q33's oracle: the planted scaled copies are the only pairs that can
    * clear cos >= 0.9 (random 64-dim embeddings never do), their SRP
    * signatures are bit-identical to the original (scaling by a positive
    * constant preserves every hyperplane sign → all four bands collide),
    * and a 16-bit band over this corpus never exceeds the skew guard — so
    * the LSH output equals exactly the planted set, which IS expressible
    * in SQL. round(cos, 6) absorbs the float-vs-double scaling ulp on
    * both engines (cos of a scaled copy is 1 - O(1e-9)).
    */
  val q33Sql: String =
    """WITH planted AS (
      |  SELECT -vec_id - 1 AS id_a, vec_id AS id_b,
      |    list_cosine_similarity(
      |      CAST(list_transform(embedding,
      |             x -> CAST(x * CAST(1.0001 AS REAL) AS REAL)) AS DOUBLE[]),
      |      CAST(embedding AS DOUBLE[])) AS cs
      |  FROM embeddings WHERE vec_id % 20 = 0)
      |SELECT id_a, id_b, ROUND(cs, 6) AS cos_sim FROM planted
      |WHERE ROUND(cs, 6) >= 0.9 ORDER BY id_a, id_b""".stripMargin

  /** Incremental dedup of a new batch against a historical corpus — the
    * daily-crawl shape: broadcast a Bloom filter of history's content
    * hashes, narrow-filter the new batch (no shuffle of history against
    * it), then exact-verify ONLY the bloom hits with a semi join. A
    * Bloom filter has no false negatives, so bloom + exact-verify equals
    * the exact join — false positives only cost verify volume (fpp 1%).
    * At 100 TB the history side is read once to build a ~MB filter and
    * never shuffled against the daily batch.
    *
    * "Today" = odd doc_ids plus planted exact copies of every 10th
    * history doc (negative marker ids), so the dup counts are non-trivial
    * and deterministic.
    */
  /** Bloom pre-filter predicate: build a filter over `xxhash64` of
    * history's key column, sized from the ACTUAL history cardinality (a
    * constant `expectedNumItems` silently saturates once history outgrows
    * it — fpp → 1 and the pre-filter degenerates to a no-op), and probe
    * with Spark's codegen [[BloomFilterMightContain]] — no per-row UDF
    * boxing. The count is one extra single-column job over history; at
    * 100 TB that is a metadata-cheap scan next to the filter build itself,
    * and it is what keeps the fpp honest at any scale. The long-hash
    * mapping cannot introduce false negatives (build and probe hash
    * identically); xxhash collisions only add verify volume.
    */
  private[graft] def bloomProbe(s: SparkSession, history: DataFrame,
      key: Column): Column =
    bloomProbe(s, history, key, math.max(history.count(), 1L))

  /** Variant for callers that already know the build-side cardinality
    * (e.g. a per-batch count that also serves an empty-batch guard) —
    * skips the sizing count job. The honesty contract stands: pass the
    * ACTUAL cardinality, not a guess.
    */
  private[graft] def bloomProbe(s: SparkSession, history: DataFrame,
      key: Column, nItems: Long): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    val bf = history.select(xxhash64(key).as("kx"))
      .stat.bloomFilter("kx", expectedNumItems = math.max(nItems, 1L),
        fpp = 0.01)
    val os = new java.io.ByteArrayOutputStream()
    bf.writeTo(os)
    GraftBridge.column(BloomFilterMightContain(
      Literal(os.toByteArray, org.apache.spark.sql.types.BinaryType),
      GraftBridge.expression(xxhash64(key))))
  }

  def q88IncrementalDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), md5(col("text")).as("h"))
    val history = docs.filter(col("doc_id") % 2 === 0)
    val planted = docs.filter(col("doc_id") % 10 === 0)
      .select((-col("doc_id") - 1L).as("doc_id"), col("lang"), col("h"))
    val today = docs.filter(col("doc_id") % 2 === 1).unionByName(planted)

    val candidates = today.filter(bloomProbe(s, history, col("h")))
    val confirmed = candidates
      .join(history.select("h").distinct(), Seq("h"), "left_semi")
    today.groupBy("lang").agg(count(lit(1)).as("n_today"))
      .join(confirmed.groupBy("lang").agg(count(lit(1)).as("n_dup")),
        Seq("lang"), "left")
      .select(col("lang"), col("n_today"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        (col("n_today") - coalesce(col("n_dup"), lit(0L))).as("n_new"))
      .orderBy("lang")
  }

  val q88Sql: String =
    """WITH d AS (
      |  SELECT doc_id, lang, md5(text) AS h FROM documents),
      |hist AS (SELECT DISTINCT h FROM d WHERE doc_id % 2 = 0),
      |today AS (
      |  SELECT doc_id, lang, h FROM d WHERE doc_id % 2 = 1
      |  UNION ALL
      |  SELECT -doc_id - 1, lang, h FROM d WHERE doc_id % 10 = 0)
      |SELECT t.lang, COUNT(*) AS n_today, COUNT(hist.h) AS n_dup,
      |  COUNT(*) - COUNT(hist.h) AS n_new
      |FROM today t LEFT JOIN hist ON t.h = hist.h
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Exact shared-SPAN detection — the ExactSubstr dedup of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better" (2021),
    * re-expressed relationally (the paper's suffix array is a
    * single-node structure): two documents share a duplicated span of
    * `>= MinSpan` whitespace tokens iff they share a RUN of consecutive
    * k-token windows along one `posA - posB` diagonal, and the run's
    * length L means a span of exactly L + k - 1 tokens. Spark shape:
    *   1. one narrow pass per side emits every k-token window with its
    *      position — O(total tokens), zero shuffle, `posexplode_outer`
    *      so InferFiltersFromGenerate cannot clone the window expression
    *      into a pre-filter (the documented explode rule);
    *   2. ONE shuffle keys windows by the 96-bit hash pair
    *      (xxhash64, murmur3) of the window text — the window STRING
    *      never enters the shuffle, so the join moves ~20 bytes per
    *      window instead of ~8× the corpus text (the r17 plan shuffled
    *      the full 8-token strings; k = 8 itself chosen by the
    *      corpus-density rule that killed char 3-grams for q143);
    *   2b. every reported pair's longest run is then STRING-CERTIFIED:
    *      the actual token slices of both documents are compared with
    *      `assert_true`, so a 96-bit hash collision that reached the
    *      output would fail LOUDLY instead of reporting a false span
    *      (short runs that only feed `n_matches` stay hash-verified;
    *      the residual double-collision odds there are ~2^-96 per
    *      candidate window pair). The certification joins are
    *      broadcast-side (the qualifying pair set is tiny), costing one
    *      extra map-side pass over the corpus and zero shuffle;
    *   3. matches group per (pair, diagonal): `pos - row_number()` folds
    *      consecutive positions into run ids, one keyed window + one
    *      aggregation — never an all-pairs product.
    * Output: pairs with their longest shared span (tokens) and total
    * matched windows; `max_span >= 20` keeps the long-plagiarism class
    * (26/25 pairs at sf0.001/0.01, measured).
    */
  private val SpanK = 8
  private val MinSpan = 20

  /** k-token windows of one side, HASH-KEYED: (doc id, 1-based position,
    * xxhash64 of the window text, murmur3 of the window text). The text
    * itself is projected away BEFORE the join shuffle — the r17 plan
    * keyed (and therefore shuffled) the full 8-token strings, ~8× the
    * corpus text; this shape moves 20 bytes per window and the 96-bit
    * pair makes a spurious hash match ~2^-96 per candidate (the reported
    * spans are string-certified on top, see the callers). Two
    * INDEPENDENT reads per query: a self-join of one lineage trips
    * AMBIGUOUS_SELF_JOIN on the join keys.
    */
  private def spanWindows(s: SparkSession, d: String,
      side: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id").as(s"${side}_id"),
        posexplode_outer(expr(
          s"""CASE WHEN size(t) >= $SpanK
             |THEN transform(sequence(1, size(t) - ${SpanK - 1}),
             |               i -> concat_ws(' ', slice(t, i, $SpanK)))
             |ELSE array() END""".stripMargin)))
      .filter(col("col").isNotNull)
      .select(col(s"${side}_id"), (col("pos") + 1).as(s"${side}_pos"),
        xxhash64(col("col")).as(s"${side}_h"),
        hash(col("col")).as(s"${side}_v"))

  /** STRING-CERTIFY one representative span per output row: re-reads the
    * two documents' token arrays and compares the ACTUAL text slices
    * with `assert_true`, so if a 96-bit hash collision ever reached a
    * reported span the query fails LOUDLY instead of reporting a false
    * duplicate. `df` must carry doc id columns `aId`/`bId` and 1-based
    * span starts `aPos`/`bPos` plus `spanLen`; rows pass through
    * unchanged. `small = true` broadcasts the span set (q218's pair
    * report: one row per doc PAIR — tiny); the per-window-OCCURRENCE
    * candidate sets (q220) are O(duplicated token positions) and must
    * NOT broadcast — on a heavily duplicated corpus they outgrow the
    * driver/broadcast cap, so they take the plain shuffled join (AQE
    * splits any residual hot rep doc at runtime).
    */
  private def certifySpans(s: SparkSession, d: String, df: DataFrame,
      aId: String, bId: String, aPos: String, bPos: String,
      spanLen: org.apache.spark.sql.Column,
      small: Boolean = true): DataFrame = {
    val ta = Tables.documents(s, d)
      .select(col("doc_id").as("__ca"), split(col("text"), " ").as("__ta"))
    val tb = Tables.documents(s, d)
      .select(col("doc_id").as("__cb"), split(col("text"), " ").as("__tb"))
    (if (small) broadcast(df) else df).join(ta, col(aId) === col("__ca"))
      .join(tb, col(bId) === col("__cb"))
      .where(assert_true(
        concat_ws(" ", slice(col("__ta"), col(aPos).cast("int"),
          spanLen.cast("int"))) ===
          concat_ws(" ", slice(col("__tb"), col(bPos).cast("int"),
            spanLen.cast("int"))),
        lit("exactsubstr: a certified span's token slices differ — " +
          "96-bit window-hash collision reached the output")).isNull)
      .drop("__ca", "__ta", "__cb", "__tb")
  }

  def q218ExactSubstr(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = spanWindows(s, d, "a")
    val b = spanWindows(s, d, "b")
    // the equality join keys on the 96-bit hash pair — 20-byte rows in
    // the shuffle, never the window text (a window value repeated m
    // times still fans out m_a × m_b genuine pairs here: that is q218's
    // pair-report SEMANTICS; the excision path q220 collapses the
    // a-side first and is the one a 100 TB pipeline runs per-corpus —
    // AQE skew-join splits any residual hot hash at runtime)
    val m = a.join(b,
        a("a_h") === b("b_h") && a("a_v") === b("b_v") &&
          a("a_id") < b("b_id"))
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"),
        col("a_pos").as("pa"), col("b_pos").as("pb"))
    val runs = m
      .withColumn("diag", col("pa") - col("pb"))
      .withColumn("run", col("pa") - row_number().over(
        Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")))
    val pairs = runs.groupBy("doc_a", "doc_b", "diag", "run")
      .agg(count(lit(1)).as("cnt"), min("pa").as("pa0"), min("pb").as("pb0"))
      .groupBy("doc_a", "doc_b")
      .agg(sum("cnt").cast("long").as("n_matches"),
        // the argmax run carries its start positions out for the string
        // certification; struct order = (cnt, pa0, pb0) so `max` is the
        // longest run, ties broken deterministically
        max(struct(col("cnt"), col("pa0"), col("pb0"))).as("mx"))
      .select(col("doc_a"), col("doc_b"), col("n_matches"),
        (col("mx.cnt") + (SpanK - 1)).cast("long").as("max_span"),
        col("mx.pa0").as("cpa"), col("mx.pb0").as("cpb"))
      .filter(col("max_span") >= MinSpan)
    certifySpans(s, d, pairs, "doc_a", "doc_b", "cpa", "cpb",
      col("max_span"))
      .select("doc_a", "doc_b", "n_matches", "max_span")
      .orderBy("doc_a", "doc_b")
  }

  val q218Sql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |grams AS (
      |  SELECT doc_id, u.i AS pos,
      |    array_to_string(t[u.i:u.i+${SpanK - 1}], ' ') AS g
      |  FROM toks, LATERAL unnest(range(1, len(t) - ${SpanK - 2})) u(i)),
      |m AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    a.pos AS pa, b.pos AS pb
      |  FROM grams a JOIN grams b USING (g)
      |  WHERE a.doc_id < b.doc_id),
      |runs AS (
      |  SELECT doc_a, doc_b, pa - pb AS diag,
      |    pa - ROW_NUMBER() OVER (
      |      PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS run
      |  FROM m),
      |per_run AS (
      |  SELECT doc_a, doc_b, diag, run, COUNT(*) AS cnt
      |  FROM runs GROUP BY 1, 2, 3, 4)
      |SELECT doc_a, doc_b, CAST(SUM(cnt) AS BIGINT) AS n_matches,
      |  CAST(MAX(cnt) + ${SpanK - 1} AS BIGINT) AS max_span
      |FROM per_run GROUP BY 1, 2
      |HAVING CAST(MAX(cnt) + ${SpanK - 1} AS BIGINT) >= $MinSpan
      |ORDER BY doc_a, doc_b""".stripMargin

  /** The span-REMOVAL transform q218's detection feeds (Lee et al.'s
    * actual dedup step): every token position of a LATER document that
    * any qualifying shared span (>= MinSpan tokens, vs any EARLIER
    * document's RAW text) covers is excised, the first occurrence kept
    * verbatim. Since r18 the ranges come from the W20 REDUCTION, not
    * the diagonal-run machinery (see the in-method proof sketch):
    * coverage is the UNION of [s, s+MinSpan) over MinSpan-token windows
    * occurring in any earlier document, and the scrubbed text
    * reassembles from the surviving tokens in position order. Built
    * from the ranges side so a FULLY-covered document (an exact
    * duplicate) still reports, with empty scrubbed text — the oracle
    * pins that edge with COALESCE. Shuffle shape (r18): the hash-keyed
    * window join probes the per-value min(doc) aggregate — map-side
    * partial, so a boilerplate window repeated m times collapses before
    * the shuffle and fans out O(m), never O(m²); the join rows carry
    * 20-byte hash keys, never the window text; qualifying windows are
    * string-certified. Then gaps-and-islands, one doc-keyed equality
    * join (the in-row range check is free) and one per-doc fold —
    * nothing all-pairs, nothing corpus-wide beyond the window join.
    */
  /** MinSpan-token windows of one side, hash-keyed like [[spanWindows]]
    * but at the FULL span width — the q220 reduction's unit (see below).
    * The window text is hashed per position directly off the token-array
    * slice (never concatenated into a shuffled string).
    */
  private def minspanWindows(s: SparkSession, d: String,
      side: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id").as(s"${side}_id"),
        posexplode_outer(expr(
          s"""CASE WHEN size(t) >= $MinSpan
             |THEN transform(sequence(1, size(t) - ${MinSpan - 1}),
             |  i -> struct(xxhash64(slice(t, i, $MinSpan)) AS h,
             |              hash(slice(t, i, $MinSpan)) AS v))
             |ELSE array() END""".stripMargin)))
      .filter(col("col").isNotNull)
      .select(col(s"${side}_id"), (col("pos") + 1).as(s"${side}_pos"),
        col("col.h").as(s"${side}_h"), col("col.v").as(s"${side}_v"))

  def q220SpanScrub(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // THE r18 HOT-KEY REDUCTION, exact by construction: coverage by
    // >= MinSpan single-witness diagonal runs of k-token windows (the
    // r17 pairwise plan) EQUALS coverage by MinSpan-token windows that
    // occur verbatim in ANY earlier document —
    //   (>=) an earlier occurrence of a MinSpan-window is itself a
    //        length-MinSpan diagonal run vs that witness;
    //   (<=) every position of a >= MinSpan shared span lies inside
    //        some MinSpan-sub-window of the span, and that sub-window
    //        occurs at the witness's corresponding offset.
    // At the full span width NO run structure survives the predicate,
    // so "occurs earlier" is a plain MIN(doc_id) per window VALUE — and
    // min is a map-side partial aggregate: a boilerplate window
    // repeated m times collapses to one row per partition BEFORE the
    // shuffle, where the r17 verdict's prescribed per-window
    // min-REPRESENTATIVE collapse (kept vs the diagonal-run machinery)
    // is REFUTED by this corpus: re-anchoring windows to their earliest
    // occurrence splits a later, longer witness's run at the seam
    // (doc 360 at sf0.001: a 77-token exact copy of doc 12 lost its
    // final token because doc 8, a 76-token prefix twin, hijacked the
    // shared windows — ExactSubstrSpec pins the fixture). The reduction
    // has no seam to split: windows decide individually.
    val reps = minspanWindows(s, d, "a")
      .groupBy(col("a_h").as("h"), col("a_v").as("v"))
      .agg(min(struct(col("a_id"), col("a_pos"))).as("rep"))
      .select(col("h"), col("v"),
        col("rep.a_id").as("rep_id"), col("rep.a_pos").as("rep_pos"))
    val b = minspanWindows(s, d, "b")
    // a window occurs in an EARLIER doc iff the global-min doc over its
    // value precedes this one (strict: first occurrences stay verbatim);
    // the rep side is one row per distinct value, so the join fan-out is
    // the probe side's own occurrence count — output-sized, never m²
    val cand = b.join(reps,
        b("b_h") === reps("h") && b("b_v") === reps("v") &&
          reps("rep_id") < b("b_id"))
      .select(col("rep_id").as("da"), col("b_id").as("doc_id"),
        col("rep_pos").as("pa0"), col("b_pos").as("start"))
    // every excision-driving window is STRING-certified against both
    // documents' raw text — a hash collision fails loudly instead of
    // scrubbing the wrong tokens. small = false: cand is one row per
    // qualifying window OCCURRENCE — O(duplicated token positions), not
    // a tiny pair set — so the certification join shuffles instead of
    // broadcasting (a fully-boilerplate corpus would blow the 8 GB
    // broadcast / driver cap otherwise)
    val certified = certifySpans(s, d, cand, "da", "doc_id", "pa0",
      "start", lit(MinSpan), small = false)
    // gaps-and-islands over qualifying starts: consecutive starts fold
    // into one maximal interval so a fully-duplicated document carries
    // ONE span row into the coverage join, not one per position (the
    // covered-positions join below is O(doc_len × islands))
    val spans = certified
      .withColumn("run", col("start") - row_number().over(
        Window.partitionBy("doc_id").orderBy("start")))
      .groupBy("doc_id", "run")
      .agg(min("start").as("start"),
        (max("start") - min("start") + MinSpan).as("len"))
      .select("doc_id", "start", "len")
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), size(col("t")).as("n_tokens"),
        posexplode_outer(col("t")))
      .select(col("doc_id"), col("n_tokens"),
        (col("pos") + 1).as("p"), col("col").as("tok"))
    val covered = toks.join(spans, Seq("doc_id"))
      .filter(col("p") >= col("start") &&
        col("p") < col("start") + col("len"))
      .select("doc_id", "p").distinct()
    val kept = toks.join(covered, Seq("doc_id", "p"), "left_anti")
    val keptAgg = kept.groupBy("doc_id")
      .agg(concat_ws(" ", transform(array_sort(
        collect_list(struct(col("p"), col("tok")))), x => x("tok")))
        .as("scrubbed_raw"))
    val affected = covered.groupBy("doc_id")
      .agg(count(lit(1)).as("n_removed"))
    val base = Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"))
    affected.join(base, Seq("doc_id"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        coalesce(col("scrubbed_raw"), lit("")).as("scrubbed"))
      .orderBy("doc_id")
  }

  val q220Sql: String =
    s"""WITH toks0 AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |grams AS (
      |  SELECT doc_id, u.i AS pos,
      |    array_to_string(t[u.i:u.i+${MinSpan - 1}], ' ') AS g
      |  FROM toks0, LATERAL unnest(range(1, len(t) - ${MinSpan - 2})) u(i)),
      |rep AS (
      |  SELECT g, MIN(doc_id) AS rep_id FROM grams GROUP BY g),
      |spans AS (
      |  SELECT b.doc_id, b.pos AS start, $MinSpan AS len
      |  FROM grams b JOIN rep r USING (g)
      |  WHERE r.rep_id < b.doc_id),
      |toks AS (
      |  SELECT doc_id, len(t) AS n_tokens, u.p AS p, t[u.p] AS tok
      |  FROM toks0, LATERAL unnest(range(1, len(t) + 1)) u(p)),
      |covered AS (
      |  SELECT DISTINCT k.doc_id, k.p
      |  FROM toks k JOIN spans s ON k.doc_id = s.doc_id
      |    AND k.p >= s.start AND k.p < s.start + s.len),
      |kept AS (
      |  SELECT k.* FROM toks k ANTI JOIN covered c
      |    ON k.doc_id = c.doc_id AND k.p = c.p),
      |kept_agg AS (
      |  SELECT doc_id, STRING_AGG(tok, ' ' ORDER BY p) AS scrubbed_raw
      |  FROM kept GROUP BY doc_id),
      |affected AS (
      |  SELECT doc_id, COUNT(*) AS n_removed FROM covered GROUP BY 1)
      |SELECT a.doc_id,
      |  (SELECT len(t) FROM toks0 WHERE doc_id = a.doc_id) AS n_tokens,
      |  a.n_removed, COALESCE(k.scrubbed_raw, '') AS scrubbed
      |FROM affected a LEFT JOIN kept_agg k ON a.doc_id = k.doc_id
      |ORDER BY a.doc_id""".stripMargin

  /** SELF-repetition scrub — the WITHIN-document counterpart of q220
    * (Lee et al. excise intra-document repeats too; q220's `a_id <
    * b_id` is strictly cross-document). A MinSpan-token window whose
    * value occurred EARLIER IN THE SAME document is duplicated; the
    * union of its [s, s+MinSpan) ranges excises, the first in-document
    * occurrence stays verbatim. Same W20-reduction exactness argument
    * as q220, one document interior at a time. Shuffle shape: both
    * sides key on (doc, 96-bit window hash) — repetition is per-doc, so
    * a pathological periodic document fans out O(its own length), never
    * corpus-coupled; qualifying windows string-certify against the
    * first occurrence (a hash collision fails loudly); everything else
    * is the per-doc fold. The row-local pass a 100 TB pipeline runs
    * right next to the Gopher repetition gates (q151/q170 measure
    * repetition; this removes it).
    */
  /** Deterministic self-repetition corpus for q227: every 7th document
    * (with >= 25 tokens) re-appends its own first 25 tokens — the
    * planted-positive pattern q26/q33 use, restated identically in the
    * DuckDB oracle, so the within-doc scrub has known work at any SF
    * (the synthetic corpus has no natural >= MinSpan intra-doc repeats
    * — measured in DuckDB before choosing).
    */
  private def selfRepDocs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), expr(
        """CASE WHEN doc_id % 7 = 0 AND size(t) >= 25
          |THEN concat_ws(' ', concat_ws(' ', t),
          |               concat_ws(' ', slice(t, 1, 25)))
          |ELSE concat_ws(' ', t) END""".stripMargin).as("text"))

  private def selfRepWindows(docs: DataFrame, side: String): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id").as(s"${side}_id"),
        posexplode_outer(expr(
          s"""CASE WHEN size(t) >= $MinSpan
             |THEN transform(sequence(1, size(t) - ${MinSpan - 1}),
             |  i -> struct(xxhash64(slice(t, i, $MinSpan)) AS h,
             |              hash(slice(t, i, $MinSpan)) AS v))
             |ELSE array() END""".stripMargin)))
      .filter(col("col").isNotNull)
      .select(col(s"${side}_id"), (col("pos") + 1).as(s"${side}_pos"),
        col("col.h").as(s"${side}_h"), col("col.v").as(s"${side}_v"))

  def q227SelfRepScrub(s: SparkSession, d: String): DataFrame = {
    // two INDEPENDENT reads (AMBIGUOUS_SELF_JOIN rule)
    val firsts = selfRepWindows(selfRepDocs(s, d), "a")
      .groupBy(col("a_id").as("fid"), col("a_h").as("h"),
        col("a_v").as("v"))
      .agg(min("a_pos").as("fp"))
    val b = selfRepWindows(selfRepDocs(s, d), "b")
    val cand = b.join(firsts,
        b("b_id") === firsts("fid") && b("b_h") === firsts("h") &&
          b("b_v") === firsts("v") && b("b_pos") > firsts("fp"))
      .select(col("b_id").as("doc_id"), col("fid"),
        col("fp"), col("b_pos").as("start"))
    // string-certify within the augmented corpus (both occurrences are
    // in the SAME document's token array). No broadcast hint: cand is
    // one row per repeated window OCCURRENCE — O(repeated positions),
    // unbounded on a chant-like corpus — so the join shuffles on doc_id
    // (each doc's candidates colocate with its one token-array row)
    val ta = selfRepDocs(s, d)
      .select(col("doc_id").as("__ca"), split(col("text"), " ").as("__ta"))
    val certified = cand.join(ta, col("doc_id") === col("__ca"))
      .where(assert_true(
        concat_ws(" ", slice(col("__ta"), col("fp").cast("int"),
          lit(MinSpan))) ===
          concat_ws(" ", slice(col("__ta"), col("start").cast("int"),
            lit(MinSpan))),
        lit("selfrep: a certified span's token slices differ — " +
          "96-bit window-hash collision reached the output")).isNull)
      .select("doc_id", "start")
    val toks = selfRepDocs(s, d)
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
    val base = selfRepDocs(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"))
    affected.join(base, Seq("doc_id"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"), col("n_removed"),
        coalesce(col("scrubbed_raw"), lit("")).as("scrubbed"))
      .orderBy("doc_id")
  }

  val q227Sql: String =
    s"""WITH docs2 AS (
      |  SELECT doc_id, CASE WHEN doc_id % 7 = 0
      |      AND len(string_split(text, ' ')) >= 25
      |    THEN text || ' ' ||
      |      array_to_string(string_split(text, ' ')[1:25], ' ')
      |    ELSE text END AS text
      |  FROM documents),
      |toks0 AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM docs2),
      |grams AS (
      |  SELECT doc_id, u.i AS pos,
      |    array_to_string(t[u.i:u.i+${MinSpan - 1}], ' ') AS g
      |  FROM toks0, LATERAL unnest(range(1, len(t) - ${MinSpan - 2})) u(i)),
      |firsts AS (
      |  SELECT doc_id, g, MIN(pos) AS fp FROM grams GROUP BY 1, 2),
      |spans AS (
      |  SELECT b.doc_id, b.pos AS start
      |  FROM grams b JOIN firsts f
      |    ON b.doc_id = f.doc_id AND b.g = f.g
      |  WHERE b.pos > f.fp),
      |toks AS (
      |  SELECT doc_id, len(t) AS n_tokens, u.p AS p, t[u.p] AS tok
      |  FROM toks0, LATERAL unnest(range(1, len(t) + 1)) u(p)),
      |covered AS (
      |  SELECT DISTINCT k.doc_id, k.p
      |  FROM toks k JOIN spans s ON k.doc_id = s.doc_id
      |    AND k.p >= s.start AND k.p < s.start + $MinSpan),
      |kept AS (
      |  SELECT k.* FROM toks k ANTI JOIN covered c
      |    ON k.doc_id = c.doc_id AND k.p = c.p),
      |kept_agg AS (
      |  SELECT doc_id, STRING_AGG(tok, ' ' ORDER BY p) AS scrubbed_raw
      |  FROM kept GROUP BY doc_id),
      |affected AS (
      |  SELECT doc_id, COUNT(*) AS n_removed FROM covered GROUP BY 1)
      |SELECT a.doc_id,
      |  (SELECT len(t) FROM toks0 WHERE doc_id = a.doc_id) AS n_tokens,
      |  a.n_removed, COALESCE(k.scrubbed_raw, '') AS scrubbed
      |FROM affected a LEFT JOIN kept_agg k ON a.doc_id = k.doc_id
      |ORDER BY a.doc_id""".stripMargin

  /** Duplicated-span CLUSTER report — the output-size-safe sibling of
    * q218's pair report (the r17 verdict's remaining q218 concern: a
    * boilerplate span duplicated across m documents is m(m-1)/2 PAIRS —
    * quadratic in the OUTPUT — but only ONE cluster). Semantics: a
    * MinSpan-token window duplicated across >= 2 distinct documents is
    * cluster material; per document, material positions fold into
    * maximal INTERVAL-UNION islands (running-max gaps-and-islands, not
    * consecutive-start runs — overlapping non-consecutive windows must
    * merge or the island text fragments); islands group by their exact
    * text, and clusters spanning >= 2 documents report (representative
    * occurrence, span length, document spread, occurrence count). Every
    * stage is hot-key safe: the spread aggregate and the island fold
    * are one-row-per-(value|island) shapes, the text grouping keys on
    * the 96-bit hash pair (text never shuffles; the oracle groups by
    * the actual string — a cross-text collision is ~2^-96 per island
    * pair, the documented q218 class). At 100 TB this is the report a
    * dedup pipeline actually pages through: one row per boilerplate
    * block with its blast radius, not millions of pair rows.
    */
  def q226SpanClusters(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // window values spread across >= 2 distinct docs (partial-agg
    // collapses per-partition duplicates of a hot value before the
    // shuffle; the distinct-doc count is one row per (value, doc))
    val spread = minspanWindows(s, d, "b")
      .groupBy(col("b_h").as("h"), col("b_v").as("v"))
      .agg(count_distinct(col("b_id")).as("nd"))
      .filter(col("nd") >= 2).select("h", "v")
    val qual = minspanWindows(s, d, "a")
      .join(spread, col("a_h") === col("h") && col("a_v") === col("v"))
      .select(col("a_id").as("doc_id"), col("a_pos").as("s"))
    // interval union per doc: a new island starts where s clears the
    // running max end of everything before it
    val w1 = Window.partitionBy("doc_id").orderBy("s")
    val islands = qual
      .withColumn("pme", max(col("s") + MinSpan).over(
        w1.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when(col("pme").isNull || col("s") > col("pme"), 1).otherwise(0))
      .withColumn("island", sum("ni").over(w1))
      .groupBy("doc_id", "island")
      .agg(min("s").as("start"), (max("s") + MinSpan).as("e"))
      .select(col("doc_id"), col("start"), (col("e") - col("start")).as("len"))
    val toks = Tables.documents(s, d)
      .select(col("doc_id").as("__d"), split(col("text"), " ").as("t"))
    val withText = islands.join(toks, col("doc_id") === col("__d"))
      .select(col("doc_id"), col("start"), col("len"),
        xxhash64(slice(col("t"), col("start").cast("int"),
          col("len").cast("int"))).as("th"),
        hash(slice(col("t"), col("start").cast("int"),
          col("len").cast("int"))).as("tv"))
    withText.groupBy("th", "tv", "len")
      .agg(count(lit(1)).as("n_occurrences"),
        count_distinct(col("doc_id")).as("n_docs"),
        min(struct(col("doc_id"), col("start"))).as("rep"))
      .filter(col("n_docs") >= 2)
      .select(col("rep.doc_id").as("rep_doc"),
        col("rep.start").cast("long").as("rep_pos"),
        col("len").cast("long").as("span_tokens"),
        col("n_docs"), col("n_occurrences"))
      .orderBy("rep_doc", "rep_pos")
  }

  val q226Sql: String =
    s"""WITH toks0 AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |g20 AS (
      |  SELECT doc_id, u.i AS s,
      |    array_to_string(t[u.i:u.i+${MinSpan - 1}], ' ') AS g
      |  FROM toks0, LATERAL unnest(range(1, len(t) - ${MinSpan - 2})) u(i)),
      |spread AS (
      |  SELECT g FROM g20 GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
      |qual AS (SELECT doc_id, s FROM g20 JOIN spread USING (g)),
      |flagged AS (
      |  SELECT doc_id, s, MAX(s + $MinSpan) OVER (
      |    PARTITION BY doc_id ORDER BY s
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
      |  FROM qual),
      |isl AS (
      |  SELECT doc_id, s, SUM(CASE WHEN pme IS NULL OR s > pme
      |    THEN 1 ELSE 0 END) OVER (
      |    PARTITION BY doc_id ORDER BY s) AS island
      |  FROM flagged),
      |islands AS (
      |  SELECT doc_id, MIN(s) AS start, MAX(s) + $MinSpan - MIN(s) AS len
      |  FROM isl GROUP BY doc_id, island),
      |wtext AS (
      |  SELECT i.doc_id, i.start, i.len,
      |    array_to_string(t[i.start:i.start+i.len-1], ' ') AS txt
      |  FROM islands i JOIN toks0 USING (doc_id)),
      |ranked AS (
      |  SELECT txt, len, doc_id, start, ROW_NUMBER() OVER (
      |    PARTITION BY txt, len ORDER BY doc_id, start) AS rn
      |  FROM wtext),
      |counts AS (
      |  SELECT txt, len, COUNT(*) AS n_occurrences,
      |    COUNT(DISTINCT doc_id) AS n_docs
      |  FROM wtext GROUP BY 1, 2 HAVING COUNT(DISTINCT doc_id) >= 2)
      |SELECT r.doc_id AS rep_doc, CAST(r.start AS BIGINT) AS rep_pos,
      |  CAST(c.len AS BIGINT) AS span_tokens, c.n_docs, c.n_occurrences
      |FROM counts c JOIN ranked r ON c.txt = r.txt AND c.len = r.len
      |WHERE r.rn = 1
      |ORDER BY rep_doc, rep_pos""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q226_span_clusters" -> (q226SpanClusters _),
    "q227_selfrep_scrub" -> (q227SelfRepScrub _),
    "q220_span_scrub" -> (q220SpanScrub _),
    "q218_exact_substr" -> (q218ExactSubstr _),
    "q25_dedup_exact" -> (q25ExactDedup _),
    "q26_neardup_minhash" -> (q26NearDupPairs _),
    "q27_neardup_simhash" -> (q27SimhashPairs _),
    "q33_neardup_embedding" -> (q33EmbeddingNearDup _),
    "q88_incremental_dedup" -> (q88IncrementalDedup _))

  val oracles: Map[String, String] = Map(
    "q226_span_clusters" -> q226Sql,
    "q227_selfrep_scrub" -> q227Sql,
    "q220_span_scrub" -> q220Sql,
    "q218_exact_substr" -> q218Sql,
    "q25_dedup_exact" -> q25Sql,
    "q26_neardup_minhash" -> q26Sql,
    "q27_neardup_simhash" -> q27Sql,
    "q33_neardup_embedding" -> q33Sql,
    "q88_incremental_dedup" -> q88Sql)
}
