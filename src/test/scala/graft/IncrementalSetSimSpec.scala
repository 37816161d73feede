package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IncrementalSetSim, SetSimJoin}

/** The incremental (stream-side) set-similarity fold must CONVERGE to
  * the batch pair set: for any partition of the corpus into arrival
  * batches, the union of per-batch emissions equals both
  * SetSimJoin.selfJoin and the brute-force all-pairs definition — and
  * each pair is emitted exactly once (no cross-batch duplicates).
  */
class IncrementalSetSimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // SetSimJoinSpec's corpus: adversarially similar random sets over a
  // small vocabulary, plus planted exact dups and one-token edits
  private def corpus: Seq[(Long, String, Seq[String])] = {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 60).map(i => s"w$i")
    val base = (0L until 80L).map { i =>
      val n = 8 + rnd.nextInt(18)
      (i, if (i % 2 == 0) "g1" else "g2",
        rnd.shuffle(vocab).take(n).toSeq.sorted)
    }
    val dups = (0 until 10).map { k =>
      val (_, g, toks) = base(k * 7)
      (1000L + k, g, toks)
    }
    val nearDups = (0 until 10).map { k =>
      val (_, g, toks) = base(k * 5 + 1)
      ((2000L + k): Long, g, (toks.drop(1) :+ s"x$k").sorted)
    }
    base ++ dups ++ nearDups
  }

  private def brute(tNum: Int, tDen: Int): Set[(Long, Long, Double)] = {
    val t = tNum.toDouble / tDen
    val c = corpus
    (for {
      (ia, ga, ta) <- c; (ib, gb, tb) <- c
      if ga == gb && ia < ib
      sa = ta.toSet; sb = tb.toSet
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= t
    } yield (ia, ib, math.rint(j * 1e6) / 1e6)).toSet
  }

  private def run(tNum: Int, tDen: Int, nBatches: Int,
      split: Long => Int): (Set[(Long, Long, Double)], Long) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_incr_spec_")
    try {
      val df = corpus.toDF("__id", "__grp", "__toks")
      (0 until nBatches).foreach { k =>
        IncrementalSetSim.processBatch(spark,
          df.filter(udf(split).apply(col("__id")) === k), dir.toString,
          tNum, tDen, batchId = k)
      }
      val rows = IncrementalSetSim.pairs(spark, dir.toString).collect()
      (rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet,
        rows.length.toLong)
    } finally graft.streaming.Replay.deleteRecursively(dir)
  }

  for ((tNum, tDen) <- Seq((4, 5), (19, 20), (1, 1))) {
    test(s"converges to brute force at t=$tNum/$tDen over 4 batches") {
      val (got, nRows) = run(tNum, tDen, 4, id => (id % 4).toInt)
      val expected = brute(tNum, tDen)
      assert(got == expected,
        s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
      assert(nRows == got.size, "a pair was emitted in more than one batch")
      assert(expected.nonEmpty)
    }
  }

  test("batch split is irrelevant: 1-batch == 7-batch == batch operator") {
    val (one, _) = run(19, 20, 1, _ => 0)
    val (seven, n7) = run(19, 20, 7, id => (id % 7).toInt)
    val df = corpus.toDF("id", "grp", "toks")
    val batch = SetSimJoin.selfJoin(() => df, "id", "grp", "toks", 19, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(one == seven && seven == batch)
    assert(n7 == seven.size)
  }

  test("armed Bloom gate (history >> arrival) loses no pairs") {
    // the gate only arms once history > 8x the arriving prefix rows
    // (below that, measured selectivity ~1 makes the build job pure
    // overhead) — a 95/5 split is safely past the threshold, and the
    // 5 late near-dups pair against HISTORY docs, so recall through the
    // armed filter is exactly what this certifies
    val dirP = java.nio.file.Files.createTempDirectory("graft_incr_spec_")
    try {
      val dir = dirP.toString
      val df = corpus.toDF("__id", "__grp", "__toks")
      IncrementalSetSim.processBatch(spark,
        df.filter(col("__id") < 2005), dir, 4, 5, batchId = 0)
      val h0 = IncrementalSetSim.historyRows(spark, dir)
      IncrementalSetSim.processBatch(spark,
        df.filter(col("__id") >= 2005), dir, 4, 5, batchId = 1)
      val h1 = IncrementalSetSim.historyRows(spark, dir)
      assert(h0 > 8 * (h1 - h0), "split failed to arm the Bloom gate")
      val got = IncrementalSetSim.pairs(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == brute(4, 5))
    } finally graft.streaming.Replay.deleteRecursively(dirP)
  }

  test("empty batches and empty token arrays neither crash nor pair") {
    val dirP = java.nio.file.Files.createTempDirectory("graft_incr_spec_")
    try {
      val dir = dirP.toString
      val empty = Seq((1L, "g", Seq.empty[String]),
        (2L, "g", Seq.empty[String])).toDF("__id", "__grp", "__toks")
      IncrementalSetSim.processBatch(spark, empty.limit(0), dir, 1, 2,
        batchId = 0)
      IncrementalSetSim.processBatch(spark, empty, dir, 1, 2, batchId = 1)
      assert(IncrementalSetSim.pairs(spark, dir).collect().isEmpty)
    } finally graft.streaming.Replay.deleteRecursively(dirP)
  }
}
