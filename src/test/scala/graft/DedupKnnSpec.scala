package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup
import graft.similarity.Knn
import graft.functions.vectors

class DedupKnnSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("minhash LSH finds the planted near-duplicates") {
    val pairs = Dedup.q26NearDupPairs(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // planted: doc_id % 10 == 0 mutated to -doc_id - 1 (negative marker
    // ids — collision-free against genuine ids at any corpus size)
    val planted = (0 until 500 by 10).map(i => (-i - 1L, i.toLong))
    val found = planted.count(pairs.contains).toDouble / planted.size
    assert(found >= 0.9, s"recall of planted near-dups: $found")
  }

  test("q26 LSH recall is exactly 1 at the gate SF (oracle precondition)") {
    // The q26 DuckDB oracle enumerates ALL exact-Jaccard >= 0.5 pairs,
    // while the Spark side emits only LSH-bucket candidates — the gate
    // holds only while LSH recall is exactly 1 on the gate corpus. This
    // asserts that precondition explicitly at sf0.01 (the driver's gate
    // SF): brute-force exact pairs == the LSH pipeline's output. If THIS
    // fails after a corpus/SF change, triage as recall < 1 (tune
    // bands/rows or maxBucket), not as an engine bug.
    val gateSf = "/root/testdata/sf0.01"
    val corpus = Dedup.corpusWithNearDups(spark, gateSf)
    val sh = corpus.select(col("doc_id"),
      graft.functions.text.shingle_hashes(col("text"), shingle = 3).as("sh"))
    val a = sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val exact = a.join(b, col("id_a") < col("id_b"))
      .withColumn("j",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(round(col("j"), 4) >= 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.q26NearDupPairs(spark, gateSf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact,
      s"LSH != exact at gate SF: missing=${exact.diff(lsh).take(5)} " +
        s"extra=${lsh.diff(exact).take(5)}")
  }

  test("q27 hot buckets sub-band instead of dropping (recall 1 under a tiny cap)") {
    // the round-7 fix: at sf0.1 the old maxBucket drop silently halved
    // q27's answer because hot buckets are exactly where near-dups live.
    // Forcing maxBucket=2 on the gate corpus makes EVERY bucket hot, so
    // this passes only through the sub-band path — output must still
    // equal the brute-force hamming<=3 enumeration.
    val gateSf = "/root/testdata/sf0.001"
    val hashed = Dedup.corpusWithNearDups(spark, gateSf)
      .select(col("doc_id"), graft.functions.text.simhash_md5(col("text")).as("sh"))
    val brute = {
      val rows = hashed.collect().map(r => (r.getLong(0), r.getLong(1)))
      (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
      } yield (ia, ib)).toSet
    }
    val bandStructs = array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bucket"))
    }: _*)
    val banded = hashed.select(col("doc_id"), col("sh"),
      explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
    val got = Dedup.hammingBandPairs(banded, "sh", maxBucket = 2)
      .withColumn("h", graft.functions.text.hamming64(col("pa"), col("pb")))
      .filter(col("h") <= 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute,
      s"sub-banding lost pairs: missing=${brute.diff(got).take(5)} " +
        s"extra=${got.diff(brute).take(5)}")
    assert(brute.nonEmpty)
  }

  // --- level-3 sub-banding (round 8): synthetic signature corpus that
  // FORCES recursion two pigeonhole levels deep. A 9-member cluster (base
  // plus two single-bit flips in each 9-bit sub-sub-band group of bits
  // 0-35, bits 48-63 zeroed for everyone so band 3 is one giant hot
  // bucket) overflows a level-2 cell under leafCap=8 — the old code
  // silently FILTERED that cell, losing all 36 cluster pairs — but every
  // level-3 cell holds at most 7 members, so the recursion splits it and
  // recovers the full brute-force pair set.
  private def mix(k: Long): Long = {
    var x = k * 0x9E3779B97F4A7C15L
    x ^= x >>> 32
    (x * 0xBF58476D1CE4E5B9L) ^ (x >>> 29)
  }

  private def bandedOf(sigs: Seq[(Long, Long)]) = {
    import spark.implicits._
    val df = sigs.toDF("doc_id", "sh")
    val bandStructs = array((0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL)).as("bucket"))
    }: _*)
    df.select(col("doc_id"), col("sh"), explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
  }

  test("hamming banding recurses to level 3 losslessly (over-cap level-2 cell splits)") {
    val base = mix(999L) & 0x0000FFFFFFFFFFFFL
    val flips = Seq(0, 1, 9, 10, 18, 19, 27, 28) // two per 9-bit group
    val cluster = base +: flips.map(i => base ^ (1L << i))
    val noise = (0 until 300).map(k => mix(k.toLong) & 0x0000FFFFFFFFFFFFL)
    val sigs = (cluster ++ noise).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    assert(brute.size >= 36, s"fixture broken: only ${brute.size} true pairs")
    val got = Dedup.hammingBandPairs(bandedOf(sigs), "sh",
        maxBucket = 2, leafCap = 8)
      .withColumn("h", graft.functions.text.hamming64(col("pa"), col("pb")))
      .filter(col("h") <= 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute,
      s"level-3 recursion lost pairs: missing=${brute.diff(got).take(5)} " +
        s"extra=${got.diff(brute).take(5)}")
  }

  test("hamming banding fails loudly (not silently) on an over-cap leaf clique") {
    // >leafCap identical signatures: no pigeonhole level can split them —
    // the contract is a raised error naming the cluster operator, never a
    // silent drop
    val sigs = (0 until 10).map(i => (i.toLong, 0xABCDEF0123L))
    val ex = intercept[Throwable] {
      Dedup.hammingBandPairs(bandedOf(sigs), "sh", maxBucket = 2, leafCap = 4)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("leafCap")),
      s"expected a loud leafCap error, got: ${messages(ex).take(3)}")
  }

  test("minhash estimate tracks exact jaccard on candidates") {
    // nearDupPairs directly: the q26 driver projection drops est_jaccard
    // (no SQL twin for the signature estimate) but the spec pins it here
    val rows = Dedup.nearDupPairs(Dedup.corpusWithNearDups(spark, sf))
      .select("est_jaccard", "exact_jaccard").collect()
    assert(rows.nonEmpty)
    val maxErr = rows.map(r => math.abs(r.getDouble(0) - r.getDouble(1))).max
    assert(maxErr < 0.35, s"max |est - exact| = $maxErr")
  }

  test("simhash banding finds planted near-duplicates too") {
    val pairs = Dedup.q27SimhashPairs(spark, sf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 500 by 10).map(i => (-i - 1L, i.toLong))
    val found = planted.count(pairs.contains).toDouble / planted.size
    assert(found >= 0.7, s"recall: $found")
  }

  test("q27 banding equals brute-force hamming at the gate SF (oracle precondition)") {
    // The q27 oracle enumerates ALL pairs at hamming <= 3; the Spark side
    // emits banded candidates. Pigeonhole (3 < 4 bands) makes recall 1 by
    // construction UNLESS a bucket trips the maxBucket=64 skew guard —
    // this asserts the banded output equals the brute-force all-pairs
    // result on the gate corpus, so a guard-dropped bucket can never
    // silently turn into a gate mismatch blamed on the engine.
    val gateSf = "/root/testdata/sf0.01"
    val hashed = Dedup.corpusWithNearDups(spark, gateSf)
      .select(col("doc_id"), graft.functions.text.simhash_md5(col("text")).as("sh"))
    val a = hashed.select(col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = hashed.select(col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val exact = a.join(b, col("id_a") < col("id_b"))
      .withColumn("h", graft.functions.text.hamming64(col("sh_a"), col("sh_b")))
      .filter(col("h") <= 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.q27SimhashPairs(spark, gateSf)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == exact,
      s"missing=${exact.diff(banded).take(5)} extra=${banded.diff(exact).take(5)}")
  }

  test("SRP-LSH embedding near-dup finds all planted scaled copies") {
    val pairs = Dedup.q33EmbeddingNearDup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // planted: vec_id % 20 == 0 rescaled, id -vec_id - 1 (500 vecs)
    val planted = (0 until 500 by 20).map(i => (-i - 1L, i.toLong)).toSet
    assert(planted.subsetOf(pairs),
      s"missing: ${planted.diff(pairs).take(5)}")
  }

  test("connected components: chains, isolated vertices, separate clusters") {
    import spark.implicits._
    import graft.dedup.Clusters
    // component A: path 1-2-3-4-5 (worst case for propagation depth);
    // component B: triangle 10-11-12; vertex 99 isolated
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 99L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("src", "dst")
    val labels = Clusters.connectedComponents(vertices, edges, maxRounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(labels(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L))
    assert(labels(99L) == 99L)
  }

  test("cosine_similarity expression matches a driver-side computation") {
    import spark.implicits._
    val row = Tables.embeddings(spark, sf).filter(col("vec_id") === 1)
      .select("embedding").as[Array[Float]].head()
    val other = Tables.embeddings(spark, sf).filter(col("vec_id") === 2)
      .select("embedding").as[Array[Float]].head()
    val expected = {
      val dot = row.zip(other).map { case (a, b) => a.toDouble * b.toDouble }.sum
      val na = math.sqrt(row.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(other.map(x => x.toDouble * x.toDouble).sum)
      dot / (na * nb)
    }
    val got = Tables.embeddings(spark, sf).filter(col("vec_id") === 1)
      .crossJoin(Tables.embeddings(spark, sf).filter(col("vec_id") === 2)
        .select(col("embedding").as("e2")))
      .select(vectors.cosine_similarity(col("embedding"), col("e2")).as("c"))
      .as[Double].head()
    assert(math.abs(got - expected) < 1e-9)
  }

  test("IVF model size is corpus-size-independent (the r8 scale fix)") {
    // the old vec_id % 97 rule grew the centroid set linearly with the
    // corpus (broadcast side O(n), assignment O(n²/97) cosines). The
    // fixed-k lowest-md5 rule must produce EXACTLY K1 centroids and at
    // most K1·K2 sub-centroids at every SF.
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val m = Knn.fitIvf(
        Tables.embeddings(spark, d).select("vec_id", "embedding"))
      assert(m.cents.size == Knn.K1, s"$d: ${m.cents.size} centroids")
      assert(m.subCents.values.map(_.size).sum <= Knn.K1 * Knn.K2,
        s"$d: ${m.subCents.values.map(_.size).sum} sub-centroids")
      assert(m.hotCids.toSet.subsetOf(m.cents.map(_._1).toSet))
    }
  }

  test("IVF hot cells subdivide: search cells bounded below the level-1 cell size") {
    // gate SF: both postures must execute (cold pass-through AND hot
    // subdivision) — CellCap sits inside the gate-SF cell-size spread
    val gate = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val mGate = Knn.fitIvf(gate)
    assert(mGate.hotCids.nonEmpty, "no hot cell at gate SF — cap drifted")
    assert(mGate.hotCids.size < Knn.K1, "no cold cell at gate SF — cap drifted")
    // bench SF: every final (cid, scid) search cell of a subdivided cell
    // must be strictly smaller than its parent level-1 cell
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select("vec_id", "embedding")
    val m = Knn.fitIvf(emb)
    val cells = Knn.assignCorpus(emb, m)
      .groupBy("cid", "scid").count()
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val parent = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val subdivided = cells.filter(_._1._2 != -1L)
    assert(subdivided.nonEmpty, "no subdivided cell at sf0.1")
    subdivided.foreach { case ((cid, scid), n) =>
      assert(n < parent(cid),
        s"sub-cell ($cid,$scid)=$n not smaller than parent=${parent(cid)}")
    }
    // the largest search cell after subdivision sits under the largest
    // level-1 cell (Voronoi splits on isotropic data can be lopsided, so
    // strict reduction — not a fixed ratio — is the honest invariant)
    assert(subdivided.values.max < parent.values.max,
      s"max sub-cell ${subdivided.values.max} vs max cell ${parent.values.max}")
  }

  test("IVF ANN recall vs exact top-k") {
    val exact = Knn.q28Knn(spark, sf).select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Knn.q29AnnIvf(spark, sf).select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // multi-probe (nprobe=2) IVF on random data: modest but real recall
    assert(recall > 0.25, s"IVF recall: $recall")
    assert(approx.nonEmpty)
  }

  test("PQ codebook is corpus-size-independent and anchors reconstruct exactly") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val cb = Knn.fitPq(
        Tables.embeddings(spark, d).select("vec_id", "embedding"))
      assert(cb.size == Knn.MSub, s"$d: ${cb.size} subspaces")
      assert(cb.forall(_.size == Knn.KPq), s"$d: codes per subspace")
      assert(cb.forall(_.forall(_.size == Knn.SubDim)), s"$d: sub-dims")
    }
    // an anchor's sub-vectors ARE codebook centers: encoding an anchor
    // must pick them (cosine 1.0 beats everything) and reconstruction
    // must be bit-identical to the original vector
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val cb = Knn.fitPq(emb)
    val anchorIds = emb
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(Knn.KPq).select("vec_id").collect().map(_.getLong(0))
    val rec = Knn.pqEncodeDecode(emb.filter(col("vec_id").isin(anchorIds: _*)), cb)
      .collect()
    assert(rec.length == Knn.KPq)
    rec.foreach { r =>
      val orig = r.getSeq[Float](1)
      val dec = r.getSeq[Float](2)
      assert(orig == dec, s"anchor ${r.getLong(0)} reconstruction drifted")
    }
  }

  test("PQ codes are MSub small ints; ADC keeps real recall vs exact top-k") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val cb = Knn.fitPq(emb)
    val enc = Knn.pqEncodeDecode(emb, cb)
      .select(col("vec_id"), col("codes"))
    val bad = enc.filter(exists(col("codes"),
      c => c < 0 || c >= Knn.KPq) || size(col("codes")) =!= Knn.MSub)
    assert(bad.count() == 0, "code out of [0, KPq) or wrong arity")
    // the quantized index stores MSub ints (8 bytes at KPq<=256) per
    // vector vs 64 floats raw: the 32x compression is structural, not a
    // tuning claim — nothing further to measure here
    val exact = Knn.q28Knn(spark, sf).select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Knn.q154AnnIvfPq(spark, sf).select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // IVF pruning (q29's) + PQ quantization error on random 64-dim data:
    // a lossy-but-real floor; q154's oracle pins the exact answer, this
    // pins that the answer still finds true neighbors
    assert(recall > 0.15, s"IVF-PQ recall: $recall")
    assert(approx.nonEmpty)
  }

  test("exact re-rank (q156) recalls at least ADC-only (q154), at two SFs") {
    // PQ reconstruction error can reorder true neighbors INSIDE the ADC
    // candidate list; the re-rank stage scores candidates with exact
    // cosines, so its top-k can only improve on ranking the same
    // candidate pool with ADC. R > TopK also widens the pool, so strict
    // improvement is typical — but the contract asserted here is the
    // monotone one that holds by construction.
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = Knn.q28Knn(spark, d).select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val adc = Knn.q154AnnIvfPq(spark, d).select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val rer = Knn.q156AnnRerank(spark, d).select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recallAdc = exact.intersect(adc).size.toDouble / exact.size
      val recallRer = exact.intersect(rer).size.toDouble / exact.size
      assert(recallRer >= recallAdc,
        s"$d: re-rank recall $recallRer < ADC recall $recallAdc")
      assert(rer.nonEmpty)
    }
  }

  test("q157 LSH recall vs exact top-k, at two SFs (the IVF-family measure)") {
    // the LSH analogue of the IVF/PQ recall floors above, run on the
    // PLAIN corpus so q157's planted twins can't occupy top-k slots the
    // exact answer doesn't have; AnnLab's curve (SCALE.md) records how
    // the floor moves with NBands/BBits
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = Knn.q28Knn(spark, d).select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val corpus = Tables.embeddings(spark, d).select("vec_id", "embedding")
      val lsh = graft.similarity.LshAnn
        .annLshOn(corpus, graft.similarity.LshAnn.queriesOf(spark, d))
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = exact.intersect(lsh).size.toDouble / exact.size
      // SRP banding on random 64-dim data: real but modest recall, like
      // the IVF floors (measured 0.18 / 0.16 — AnnLab, SCALE.md curve);
      // candidates ≈ NBands·N/2^BBits keeps this non-degenerate at both
      // SFs
      assert(recall > 0.1, s"$d: LSH recall $recall")
      assert(lsh.nonEmpty)
    }
  }

  test("q157 LSH ANN surfaces every query's planted twin at rank 1") {
    // a positive-scaled copy has an IDENTICAL SRP signature (every
    // hyperplane sign preserved), so the twin collides in all NBands
    // bands and wins the ranking at cosine ~1.0
    val top1 = graft.similarity.LshAnn.q157AnnLsh(spark, sf)
      .filter(col("rn") === 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(top1.length == 10)
    top1.foreach { case (qid, vid, cos) =>
      assert(vid == -qid - 1, s"q$qid rank-1 is $vid, expected twin ${-qid - 1}")
      assert(cos >= 0.999999, s"q$qid twin cosine $cos")
    }
  }

  test("q158 streaming ANN index converges to the batch LSH answer") {
    // corpus-independent model → the maintained top-k must equal q157
    // ROW-IDENTICALLY for any micro-batch split (selection over union
    // with a total order); this pins the cross-path equality in-suite
    // (the driver gate pins both against the same DuckDB oracle)
    val batch = graft.similarity.LshAnn.q157AnnLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val stream = graft.similarity.LshAnn.q158StreamAnn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(stream == batch,
      s"stream != batch: missing=${(batch -- stream).take(3)} " +
        s"extra=${(stream -- batch).take(3)}")
    assert(batch.nonEmpty)
  }

  test("q156 similarities are EXACT cosines (re-rank really left PQ space)") {
    val res = Knn.q156AnnRerank(spark, sf)
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val qv = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val drift = res
      .join(emb, "vec_id").join(qv, "qid")
      .withColumn("true_cos",
        round(vectors.cosine_similarity(col("qv"), col("embedding")), 6))
      .filter(col("true_cos") =!= col("cos_sim"))
    assert(drift.count() == 0,
      "q156 reported a similarity that is not the exact rounded cosine")
  }
}
