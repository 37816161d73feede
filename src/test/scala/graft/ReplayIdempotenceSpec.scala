package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IncrementalSetSim
import graft.operators.TxTable
import graft.streaming.{PhashStream, Replay, TxState}
import graft.similarity.LshAnn

/** `foreachBatch` is AT-LEAST-ONCE: a crash between a state write and the
  * stream checkpoint commit replays the whole batch. These are the
  * kill-and-restart proofs (VERDICT r10 task 1) for all three incremental
  * indexes: re-running a fold with the same batchId — after a complete
  * first attempt (worst case: every commit landed) or a partial one
  * (crash between sibling-table commits) — leaves the converged state and
  * emitted pair/top-k set IDENTICAL to a failure-free run. Since r12 the
  * substrate under test is [[TxState]] on [[TxTable]] manifests (VERDICT
  * r11 stretch item 8): idempotence is the (state, batchId) txn no-op +
  * time-traveled `< batchId` reads, and the crash simulation drops a
  * table's newest MANIFEST (atomic publish leaves no torn middle). Plus
  * the compaction proofs (task 4): [[TxState.compact]] — a committed
  * OPTIMIZE + retention vacuum — between batches changes no converged
  * result.
  */
class ReplayIdempotenceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ----------------------------------------------------------- fixtures

  private def docCorpus: Seq[(Long, String, Seq[String])] = {
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 60).map(i => s"w$i")
    val base = (0L until 60L).map { i =>
      val n = 8 + rnd.nextInt(14)
      (i, if (i % 2 == 0) "g1" else "g2", rnd.shuffle(vocab).take(n).toSeq.sorted)
    }
    val dups = (0 until 8).map { k =>
      val (_, g, toks) = base(k * 7); (1000L + k, g, toks)
    }
    base ++ dups
  }

  private def bruteDocs: Set[(Long, Long, Double)] = {
    val c = docCorpus
    (for {
      (ia, ga, ta) <- c; (ib, gb, tb) <- c
      if ga == gb && ia < ib
      sa = ta.toSet; sb = tb.toSet
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= 0.95
    } yield (ia, ib, math.rint(j * 1e6) / 1e6)).toSet
  }

  private def phCorpus: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(31)
    val base = (0 until 300).map(i => (i.toLong, rnd.nextLong()))
    val twins = (0 until 12).map { j =>
      val (id, h) = base(j * 13)
      (2000L + j, h ^ (1L << (j % 64)))
    }
    base ++ twins
  }

  private def brutePh: Set[(Long, Long, Int)] = {
    val all = phCorpus
    (for {
      (ia, ha) <- all; (ib, hb) <- all
      if ia < ib
      hm = java.lang.Long.bitCount(ha ^ hb)
      if hm <= 3
    } yield (ia, ib, hm)).toSet
  }

  // batchIds -> which fold calls run; a replayed id appears twice
  private def docDrain(dir: String, schedule: Seq[Long],
      partial: Set[Long] = Set.empty): Unit = {
    val df = docCorpus.toDF("__id", "__grp", "__toks")
    schedule.foreach { k =>
      IncrementalSetSim.processBatch(spark,
        df.filter(col("__id") % 4 === k), dir, 19, 20, batchId = k)
      // simulate a crash AFTER the prefix/toks commits but BEFORE the
      // pairs commit: drop the pairs table's newest manifest (what a real
      // crash leaves — the data dir orphans, the commit never existed),
      // forcing the replayed attempt to be the one that publishes it
      if (partial.contains(k))
        TxState.dropLastCommit(s"$dir/pairs")
    }
  }

  private def docPairs(dir: String): (Set[(Long, Long, Double)], Long) = {
    val rows = IncrementalSetSim.pairs(spark, dir).collect()
    (rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet,
      rows.length.toLong)
  }

  // --------------------------------------------------- q153 replay proof

  test("q153: replaying any batch (complete or partial attempt) changes nothing") {
    val clean = java.nio.file.Files.createTempDirectory("graft_idem_")
    val replayed = java.nio.file.Files.createTempDirectory("graft_idem_")
    try {
      docDrain(clean.toString, Seq(0L, 1L, 2L, 3L))
      // batches 1 and 2 each retried after a COMPLETE first attempt —
      // the worst case, where every state write of the failed attempt
      // already landed (the partial-crash case is the next test)
      docDrain(replayed.toString, Seq(0L, 1L, 1L, 2L, 2L, 3L))
      val (cleanSet, cleanN) = docPairs(clean.toString)
      val (gotSet, gotN) = docPairs(replayed.toString)
      assert(cleanSet == bruteDocs && gotSet == bruteDocs)
      assert(cleanN == cleanSet.size && gotN == gotSet.size,
        "a replay duplicated emitted pairs")
      // state equality, not just result equality: history rows the next
      // batch would read are identical after the retry
      val histClean = IncrementalSetSim.historyRows(spark, clean.toString)
      val histGot = IncrementalSetSim.historyRows(spark, replayed.toString)
      assert(histClean == histGot, "a replay duplicated state rows")
    } finally { Replay.deleteRecursively(clean); Replay.deleteRecursively(replayed) }
  }

  test("q153: crash after state write but before pairs write, then retry") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idem_")
    try {
      // batch 1's first attempt loses its pairs delta (partial crash);
      // the retry must regenerate it against the SAME pre-batch history
      docDrain(dir.toString, Seq(0L, 1L), partial = Set(1L))
      docDrain(dir.toString, Seq(1L, 2L, 3L))
      val (got, n) = docPairs(dir.toString)
      assert(got == bruteDocs)
      assert(n == got.size)
    } finally Replay.deleteRecursively(dir)
  }

  // --------------------------------------------------- q155 replay proof

  test("q155: replaying batches changes neither pairs nor index state") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idem_")
    try {
      val df = phCorpus.toDF("doc_id", "ph")
      def run(k: Long): Unit = PhashStream.processBatch(spark,
        df.filter(col("doc_id") % 3 === k), dir.toString, batchId = k)
      Seq(0L, 0L, 1L, 2L, 2L).foreach(run) // 0 and 2 replayed
      val pairs = TxState.readBefore(spark, s"$dir/pairs",
        new org.apache.spark.sql.types.StructType()
          .add("id_a", "long").add("id_b", "long").add("hamming", "int"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(pairs.toSet == brutePh)
      assert(pairs.length == pairs.toSet.size, "replay duplicated pairs")
      // the banded index holds each doc exactly once per band, and the
      // replayed batches minted no extra versions (txn no-op)
      val nBandRows = TxState.historyRows(spark, s"$dir/banded")
      assert(nBandRows == phCorpus.size * 4L, "replay duplicated band rows")
      assert(TxTable.versions(s"$dir/banded").size == 3,
        "a replayed batch minted an extra banded-index version")
    } finally Replay.deleteRecursively(dir)
  }

  // --------------------------------------------------- q158 replay proof

  test("q158: versioned top-k state is replay-idempotent") {
    val rnd = new scala.util.Random(41)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f).toSeq))
    val df = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val qb = LshAnn.queryBandRows(
      df.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qv")))
    def drain(dir: String, schedule: Seq[Long]): Seq[(Long, Long, Double)] = {
      schedule.foreach { k =>
        LshAnn.processBatch(spark,
          df.filter(col("vec_id") % 4 === k), qb, dir, batchId = k)
      }
      TxState.readBefore(spark, s"$dir/topk",
        new org.apache.spark.sql.types.StructType()
          .add("qid", "long").add("vec_id", "long").add("cos_sim", "double"))
        .orderBy(col("qid"), desc("cos_sim"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    }
    val clean = java.nio.file.Files.createTempDirectory("graft_idem_")
    val replayed = java.nio.file.Files.createTempDirectory("graft_idem_")
    try {
      val a = drain(clean.toString, Seq(0L, 1L, 2L, 3L))
      val b = drain(replayed.toString, Seq(0L, 1L, 1L, 2L, 3L, 3L))
      assert(a == b, "replaying a batch changed the converged top-k")
      assert(a.nonEmpty)
    } finally { Replay.deleteRecursively(clean); Replay.deleteRecursively(replayed) }
  }

  // --------------------------------------------------- compaction proofs

  test("q153/q155: mid-replay compaction leaves converged results row-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idem_")
    val ph = java.nio.file.Files.createTempDirectory("graft_idem_")
    try {
      // q153: two batches, compact between drains, two more
      docDrain(dir.toString, Seq(0L, 1L))
      Seq("prefix", "toks", "pairs").foreach(sub =>
        TxState.compact(spark, s"$dir/$sub"))
      docDrain(dir.toString, Seq(2L, 3L))
      val (got, n) = docPairs(dir.toString)
      assert(got == bruteDocs && n == got.size)
      // compaction actually compacted (1 compacted file + the two
      // post-compaction deltas) and vacuum bounded the version history
      val pfxSnap = TxTable.currentSnapshot(s"$dir/prefix").get
      assert(pfxSnap.files.size == 3, s"prefix files: ${pfxSnap.files}")

      // q155: same shape on the phash index
      val df = phCorpus.toDF("doc_id", "ph")
      def run(k: Long): Unit = PhashStream.processBatch(spark,
        df.filter(col("doc_id") % 3 === k), ph.toString, batchId = k)
      Seq(0L, 1L).foreach(run)
      Seq("banded", "pairs").foreach(sub =>
        TxState.compact(spark, s"$ph/$sub"))
      run(2L)
      val pairs = TxState.readBefore(spark, s"$ph/pairs",
        new org.apache.spark.sql.types.StructType()
          .add("id_a", "long").add("id_b", "long").add("hamming", "int"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(pairs.toSet == brutePh && pairs.length == pairs.toSet.size)
    } finally { Replay.deleteRecursively(dir); Replay.deleteRecursively(ph) }
  }

  test("TxState: compaction + retention keep reads exact; replay below " +
      "the vacuum horizon fails to resolve (the documented contract)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idem_")
    try {
      val d = s"$dir/state"
      TxState.writeBatch(Seq(1L).toDF("v"), d, 0)
      TxState.writeBatch(Seq(2L).toDF("v"), d, 1)
      TxState.compact(spark, d)
      TxState.writeBatch(Seq(3L).toDF("v"), d, 2)
      val schema = new org.apache.spark.sql.types.StructType().add("v", "long")
      val vs = TxState.readBefore(spark, d, schema)
        .collect().map(_.getLong(0)).sorted
      assert(vs.toSeq == Seq(1L, 2L, 3L), vs.toSeq)
      // the `< batchId` rule across the compaction: batch 2 replay sees
      // the compacted snapshot of batches 0-1 only
      val before2 = TxState.readBefore(spark, d, schema, beforeBatch = 2)
        .collect().map(_.getLong(0)).sorted
      assert(before2.toSeq == Seq(1L, 2L))
      // compacted: the pre-batch-2 snapshot is a single file
      assert(TxTable.snapshotBefore(d, "state", 2L).get.files.size == 1)
      // a replay BELOW the vacuum horizon cannot resolve its pre-batch
      // snapshot (vacuum dropped it) — LOUD failure, never a silently
      // empty history a replayed fold would recompute wrong against
      val ex = intercept[java.io.IOException](
        TxState.readBefore(spark, d, schema, beforeBatch = 1))
      assert(ex.getMessage.contains("retention"))
      // while a FRESH table's first batch legitimately reads empty
      val fresh = s"$dir/fresh"
      assert(TxState.readBefore(spark, fresh, schema, beforeBatch = 0)
        .collect().isEmpty)
    } finally Replay.deleteRecursively(dir)
  }
}
