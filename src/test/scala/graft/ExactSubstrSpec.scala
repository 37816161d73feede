package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r18 ExactSubstr scale rework, pinned three ways:
  *
  *  1. the W20 REDUCTION THEOREM (coverage by >= MinSpan single-witness
  *     diagonal runs of k-token windows == coverage by MinSpan-token
  *     windows occurring in any earlier doc) holds on adversarial
  *     small-vocab random corpora where mosaic overlaps are dense —
  *     checked against a brute-force of the r17 pairwise semantics;
  *  2. the r17 verdict's prescribed per-window min-REPRESENTATIVE
  *     collapse (keep the diagonal-run machinery, re-anchor every
  *     window to its globally earliest occurrence) is REFUTED by an
  *     executable fixture — the real-corpus shape that broke it at
  *     sf0.001 (doc 360): a full copy of a later doc loses its tail
  *     when an earlier prefix-twin hijacks the shared windows;
  *  3. the hot-window fan-out is measured: a boilerplate span planted
  *     in m documents drives the r17 pairwise window join to O(m²)
  *     match rows while the reduction's rep-probe join stays linear.
  */
class ExactSubstrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val K = 8       // SpanK — detection window width
  private val MinSpan = 20

  private def writeDocs(docs: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = s"/tmp/graft_es_${java.util.UUID.randomUUID()}"
    docs.map { case (id, t) => (id, t, "en", "fix", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  /** Brute-force of the r17 semantics, driver-side: positions of `doc`
    * covered by a >= MinSpan maximal diagonal run of K-token window
    * matches vs ANY single earlier document.
    */
  private def bruteCoverage(docs: Seq[(Long, Array[String])],
      doc: Long): Set[Int] = {
    val t = docs.find(_._1 == doc).get._2
    val covered = scala.collection.mutable.Set[Int]()
    for ((da, ta) <- docs if da < doc) {
      // match grid on one diagonal = consecutive window equality runs
      for (diag <- -(t.length) to ta.length) {
        var runLen = 0
        var pb = 1
        while (pb <= t.length - K + 1) {
          val pa = pb + diag
          val m = pa >= 1 && pa <= ta.length - K + 1 &&
            (0 until K).forall(j => ta(pa - 1 + j) == t(pb - 1 + j))
          if (m) runLen += 1
          else {
            if (runLen + K - 1 >= MinSpan)
              ((pb - runLen) to (pb - 1) + K - 1).foreach(covered += _)
            runLen = 0
          }
          pb += 1
        }
        if (runLen + K - 1 >= MinSpan)
          ((pb - runLen) to (pb - 1) + K - 1).foreach(covered += _)
      }
    }
    covered.toSet
  }

  /** The W20 reduction, driver-side: positions covered by a
    * MinSpan-token window whose value occurs in an earlier doc.
    */
  private def w20Coverage(docs: Seq[(Long, Array[String])],
      doc: Long): Set[Int] = {
    val minDoc = scala.collection.mutable.Map[String, Long]()
    for ((id, t) <- docs; s <- 1 to t.length - MinSpan + 1) {
      val w = t.slice(s - 1, s - 1 + MinSpan).mkString(" ")
      minDoc.update(w, math.min(minDoc.getOrElse(w, Long.MaxValue), id))
    }
    val t = docs.find(_._1 == doc).get._2
    (for {
      s <- 1 to t.length - MinSpan + 1
      w = t.slice(s - 1, s - 1 + MinSpan).mkString(" ")
      if minDoc(w) < doc
      p <- s until s + MinSpan
    } yield p).toSet
  }

  /** The r17 verdict's min-representative collapse, driver-side: the
    * K-window diagonal-run machinery, but every window value re-anchored
    * to its single globally earliest occurrence before run detection.
    */
  private def collapseCoverage(docs: Seq[(Long, Array[String])],
      doc: Long): Set[Int] = {
    val rep = scala.collection.mutable.Map[String, (Long, Int)]()
    for ((id, t) <- docs; s <- 1 to t.length - K + 1) {
      val w = t.slice(s - 1, s - 1 + K).mkString(" ")
      val cur = rep.getOrElse(w, (Long.MaxValue, Int.MaxValue))
      if (id < cur._1 || (id == cur._1 && s < cur._2))
        rep.update(w, (id, s))
    }
    val t = docs.find(_._1 == doc).get._2
    // matches: (da, pa) = rep of this window, if da < doc
    val ms = (1 to t.length - K + 1).flatMap { pb =>
      val w = t.slice(pb - 1, pb - 1 + K).mkString(" ")
      val (da, pa) = rep(w)
      if (da < doc) Some((da, pa.toLong - pb, pb)) else None
    }
    val covered = scala.collection.mutable.Set[Int]()
    for (((_, _), grp) <- ms.groupBy(m => (m._1, m._2))) {
      val pbs = grp.map(_._3).sorted
      var runStart = -1; var prev = -100
      def flush(end: Int): Unit =
        if (runStart > 0 && end - runStart + 1 + K - 1 >= MinSpan)
          (runStart to end + K - 1).foreach(covered += _)
      for (pb <- pbs) {
        if (pb != prev + 1) { flush(prev); runStart = pb }
        prev = pb
      }
      flush(prev)
    }
    covered.toSet
  }

  private def vocabDoc(rnd: scala.util.Random, n: Int,
      vocab: Array[String]): Array[String] =
    Array.fill(n)(vocab(rnd.nextInt(vocab.length)))

  test("W20 reduction == r17 diagonal-run semantics on mosaic-dense random corpora") {
    val rnd = new scala.util.Random(181)
    for (trial <- 1 to 12) {
      // tiny vocab → chance 8-grams collide across docs constantly (the
      // mosaic regime); planted copies create genuine long spans
      val vocab = Array("a", "b", "c")
      val base = vocabDoc(rnd, 30 + rnd.nextInt(20), vocab)
      val docs = (1L to 6L).map { id =>
        val t =
          if (id >= 4 && rnd.nextBoolean()) {
            // splice a >= MinSpan chunk of an earlier doc at a random offset
            val src = vocabDoc(rnd, 25, vocab)
            vocabDoc(rnd, rnd.nextInt(8), vocab) ++ base.take(22) ++
              vocabDoc(rnd, rnd.nextInt(8), vocab) ++ src
          } else vocabDoc(rnd, 30 + rnd.nextInt(25), vocab)
        (id, t)
      }
      for (id <- 2L to 6L) {
        val b = bruteCoverage(docs, id)
        val w = w20Coverage(docs, id)
        assert(b == w,
          s"trial $trial doc $id: brute ${b.toSeq.sorted} != w20 ${w.toSeq.sorted}\n" +
            docs.map { case (i, t) => s"$i: ${t.mkString(" ")}" }.mkString("\n"))
      }
    }
  }

  test("the min-representative collapse is REFUTED: prefix-twin fixture loses the tail") {
    // the doc-360 shape from sf0.001: doc 12 = 77 tokens; doc 8 = its
    // 76-token prefix; doc 360 = exact copy of doc 12. Every shared
    // window's earliest occurrence lives in doc 8, so the collapse
    // splits doc 360's full-length run vs doc 12 at the seam and leaves
    // the final token unexcised. The W20 reduction covers all 77.
    val toks = (1 to 76).map(i => s"t${i % 9}w$i").toArray // 76 tokens
    val full = toks :+ "tail"
    val docs = Seq(8L -> toks, 12L -> full, 360L -> full)
    val brute = bruteCoverage(docs, 360L)
    val w20 = w20Coverage(docs, 360L)
    val collapsed = collapseCoverage(docs, 360L)
    assert(brute == (1 to 77).toSet, s"brute: ${brute.toSeq.sorted}")
    assert(w20 == brute, "the reduction must match the exact semantics")
    assert(collapsed == (1 to 76).toSet,
      s"expected the collapse to LOSE position 77, got ${collapsed.toSeq.sorted}")
    // and the ENGINE (which implements the reduction) scrubs all 77
    val dir = writeDocs(docs.map { case (id, t) => (id, t.mkString(" ")) })
    val out = graft.dedup.Dedup.q220SpanScrub(spark, dir)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_removed"),
        r.getAs[String]("scrubbed"))).toSeq
    assert(out.contains((360L, 77L, "")), s"engine output: $out")
    assert(out.contains((12L, 76L, "tail")), s"engine output: $out")
    assert(!out.exists(_._1 == 8L), "first occurrence must stay verbatim")
  }

  test("hot boilerplate window: rep-probe join is linear where pairwise is quadratic") {
    import spark.implicits._
    val m = 40
    val boiler = (1 to 25).map(i => s"lic$i") // one 25-token license block
    val docs = (1L to m.toLong).map { id =>
      // distinct flanks so ONLY the boilerplate is shared
      val pre = (1 to 6).map(j => s"p${id}x$j")
      val post = (1 to 6).map(j => s"s${id}y$j")
      (id, (pre ++ boiler ++ post).mkString(" "))
    }
    val dir = writeDocs(docs)
    // r17 shape: K-token windows joined pairwise on their value
    val g = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(t) - ${K - 1}), i -> concat_ws(' ', slice(t, i, $K)))")))
      .select(col("doc_id"), col("col").as("g"))
    val g2 = g.select(col("doc_id").as("doc_id2"), col("g").as("g2"))
    val pairwiseRows = g.join(g2, col("g") === col("g2") &&
      col("doc_id") < col("doc_id2")).count()
    // each of the 18 interior boilerplate K-windows matches across all
    // m(m-1)/2 doc pairs → provably quadratic in m
    val interiorShared = 25 - K + 1
    assert(pairwiseRows >= interiorShared.toLong * m * (m - 1) / 2,
      s"pairwise rows $pairwiseRows")
    // r18 shape: every occurrence probes ONE rep row per window value
    val reps = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(t) - ${MinSpan - 1}), i -> xxhash64(slice(t, i, $MinSpan)))")))
      .groupBy(col("col").as("h")).agg(min("doc_id").as("rep_id"))
    val probe = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(t) - ${MinSpan - 1}), i -> xxhash64(slice(t, i, $MinSpan)))")))
      .select(col("doc_id"), col("col").as("h"))
    val candRows = probe.join(reps, Seq("h"))
      .filter(col("rep_id") < col("doc_id")).count()
    // qualifying rows = the 6 fully-boilerplate W20 starts per later doc
    val w20Shared = 25 - MinSpan + 1
    assert(candRows == w20Shared.toLong * (m - 1),
      s"cand rows $candRows != ${w20Shared * (m - 1)}")
    assert(candRows * 50 < pairwiseRows,
      s"expected >50x separation: cand=$candRows pairwise=$pairwiseRows")
    // and the engine's q220 excises exactly the boilerplate in every
    // later doc (25 tokens), leaving the flanks
    val out = graft.dedup.Dedup.q220SpanScrub(spark, dir)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_removed"))).toMap
    assert(out.keySet == (2L to m.toLong).toSet, s"affected: ${out.keySet}")
    assert(out.values.forall(_ == 25L), s"per-doc removals: $out")
  }

  test("q226 cluster report: one row per boilerplate block where the pair report is quadratic") {
    // the m=40 license fixture again: q218's pair semantics yield
    // m(m-1)/2 = 780 rows; the cluster report yields ONE row with the
    // blast radius
    val m = 40
    val boiler = (1 to 25).map(i => s"lic$i")
    val docs = (1L to m.toLong).map { id =>
      val pre = (1 to 6).map(j => s"p${id}x$j")
      val post = (1 to 6).map(j => s"s${id}y$j")
      (id, (pre ++ boiler ++ post).mkString(" "))
    }
    val dir = writeDocs(docs)
    val out = graft.dedup.Dedup.q226SpanClusters(spark, dir).collect()
    assert(out.length == 1, out.mkString("\n"))
    val r = out.head
    assert(r.getAs[Long]("rep_doc") == 1L && r.getAs[Long]("rep_pos") == 7L)
    assert(r.getAs[Long]("span_tokens") == 25L)
    assert(r.getAs[Long]("n_docs") == m.toLong &&
      r.getAs[Long]("n_occurrences") == m.toLong)
  }

  test("q226 interval union: overlapping non-consecutive windows merge into one island") {
    // two docs share two 20-token blocks separated by 5 shared tokens:
    // qualifying window starts are NOT all consecutive, but their
    // [s, s+20) ranges chain — the island must be the single 45-token
    // span, not fragments
    val shared = (1 to 45).map(i => s"c$i")
    val docs = Seq(
      1L -> (shared ++ Seq("z1", "z2")).mkString(" "),
      2L -> (Seq("a1", "a2", "a3") ++ shared).mkString(" "))
    val dir = writeDocs(docs)
    val out = graft.dedup.Dedup.q226SpanClusters(spark, dir)
      .collect().map(r => (r.getAs[Long]("rep_doc"),
        r.getAs[Long]("rep_pos"), r.getAs[Long]("span_tokens"),
        r.getAs[Long]("n_docs"))).toSeq
    assert(out == Seq((1L, 1L, 45L, 2L)), out.toString)
  }

  test("q228 stream fold is arrival-order independent: a late-arriving earlier doc retroactively covers") {
    import spark.implicits._
    // the prefix-twin family, delivered ADVERSARIALLY: the copies
    // (docs 12, 360) arrive BEFORE the earliest witness (doc 8). At
    // batch 1 nothing is covered (12 is the min holder of every shared
    // window); when 8 arrives, the BACKWARD leg must retroactively
    // cover doc 12's shared prefix and re-anchor doc 360's coverage —
    // the converged event set must equal the batch q220 coverage.
    val toks = (1 to 76).map(i => s"t${i % 9}w$i")
    val full = toks :+ "tail"
    val stateDir = s"/tmp/graft_sspan_${java.util.UUID.randomUUID()}"
    val b1 = Seq((12L, full.mkString(" ")), (360L, full.mkString(" ")))
      .toDF("doc_id", "text")
    val b2 = Seq((8L, toks.mkString(" "))).toDF("doc_id", "text")
    graft.streaming.SpanStream.processBatch(spark, b1, stateDir, 0L)
    graft.streaming.SpanStream.processBatch(spark, b2, stateDir, 1L)
    val covSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("start",
        org.apache.spark.sql.types.IntegerType)))
    val events = graft.streaming.TxState.readBefore(spark,
      s"$stateDir/covered", covSchema)
      .dropDuplicates("doc_id", "start")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val coveredPos = events.groupBy(_._1).view.mapValues(_.flatMap {
      case (_, s) => s until s + 20 }.toSet).toMap
    // doc 360: full 77 tokens (witness doc 12 arrived WITH it — within-
    // batch leg — and doc 8 later re-covers the prefix); doc 12: its
    // 76-token shared prefix, covered ONLY by the backward leg
    assert(coveredPos(360L) == (1 to 77).toSet,
      s"doc 360: ${coveredPos.get(360L).map(_.toSeq.sorted)}")
    assert(coveredPos(12L) == (1 to 76).toSet,
      s"doc 12: ${coveredPos.get(12L).map(_.toSeq.sorted)}")
    assert(!coveredPos.contains(8L), "the earliest doc stays verbatim")
    graft.streaming.Replay.deleteRecursively(
      java.nio.file.Paths.get(stateDir))
  }

  test("q218 detection on a planted family reports string-certified spans") {
    // three docs sharing one 30-token block: q218's pair report keeps
    // its pairwise semantics (all 3 pairs), hash-keyed + certified
    val block = (1 to 30).map(i => s"b$i")
    val docs = Seq(
      1L -> ((1 to 5).map(i => s"a$i") ++ block).mkString(" "),
      2L -> (block ++ (1 to 5).map(i => s"c$i")).mkString(" "),
      3L -> ((1 to 3).map(i => s"d$i") ++ block ++ Seq("z1")).mkString(" "))
    val dir = writeDocs(docs)
    val out = graft.dedup.Dedup.q218ExactSubstr(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("max_span"))).toSeq
    assert(out == Seq((1L, 2L, 30L), (1L, 3L, 30L), (2L, 3L, 30L)), out.toString)
  }
}
