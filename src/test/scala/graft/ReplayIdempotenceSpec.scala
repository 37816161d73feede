package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IncrementalSetSim
import graft.streaming.{PhashStream, Replay, StateDir}
import graft.similarity.LshAnn

/** `foreachBatch` is AT-LEAST-ONCE: a crash between a state write and the
  * stream checkpoint commit replays the whole batch. These are the
  * kill-and-restart proofs (VERDICT r10 task 1) for all three incremental
  * indexes: re-running a fold with the same batchId — after a complete
  * first attempt (worst case: every write landed) or a partial one (crash
  * mid-batch) — leaves the converged state and emitted pair/top-k set
  * IDENTICAL to a failure-free run. Plus the compaction proofs (task 4):
  * [[StateDir.compact]] between batches changes no converged result.
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
      // simulate a crash AFTER the prefix/toks writes but BEFORE the
      // pairs write: drop this attempt's pairs delta, forcing the
      // replayed attempt to be the one that produces it
      if (partial.contains(k))
        Replay.deleteRecursively(
          new java.io.File(s"$dir/pairs", f"b$k%06d").toPath)
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
      val pairs = StateDir.read(spark, s"$dir/pairs",
        new org.apache.spark.sql.types.StructType()
          .add("id_a", "long").add("id_b", "long").add("hamming", "int"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(pairs.toSet == brutePh)
      assert(pairs.length == pairs.toSet.size, "replay duplicated pairs")
      // the banded index holds each doc exactly once per band
      val nBandRows = StateDir.historyRows(spark, s"$dir/banded")
      assert(nBandRows == phCorpus.size * 4L, "replay duplicated band rows")
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
      StateDir.readNewestVersion(spark, s"$dir/topk",
        new org.apache.spark.sql.types.StructType()
          .add("qid", "long").add("vec_id", "long").add("cos_sim", "double"),
        Long.MaxValue)
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
      // q153: two batches, compact everything below batch 2, two more
      docDrain(dir.toString, Seq(0L, 1L))
      Seq("prefix", "toks", "pairs").foreach(sub =>
        StateDir.compact(spark, s"$dir/$sub", upToBatch = 2))
      docDrain(dir.toString, Seq(2L, 3L))
      val (got, n) = docPairs(dir.toString)
      assert(got == bruteDocs && n == got.size)
      // compaction actually compacted: one c-dir, no absorbed b-dirs
      val prefixSubs = new java.io.File(s"$dir/prefix").listFiles()
        .map(_.getName).sorted.toSeq
      assert(prefixSubs == Seq("b000002", "b000003", "c000002"), prefixSubs)

      // q155: same shape on the phash index
      val df = phCorpus.toDF("doc_id", "ph")
      def run(k: Long): Unit = PhashStream.processBatch(spark,
        df.filter(col("doc_id") % 3 === k), ph.toString, batchId = k)
      Seq(0L, 1L).foreach(run)
      Seq("banded", "pairs").foreach(sub =>
        StateDir.compact(spark, s"$ph/$sub", upToBatch = 2))
      run(2L)
      val pairs = StateDir.read(spark, s"$ph/pairs",
        new org.apache.spark.sql.types.StructType()
          .add("id_a", "long").add("id_b", "long").add("hamming", "int"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(pairs.toSet == brutePh && pairs.length == pairs.toSet.size)
    } finally { Replay.deleteRecursively(dir); Replay.deleteRecursively(ph) }
  }

  test("StateDir: reader prefers newest compaction and skips absorbed deltas") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idem_")
    try {
      val d = s"$dir/state"
      StateDir.writeBatch(Seq(1L).toDF("v"), d, 0)
      StateDir.writeBatch(Seq(2L).toDF("v"), d, 1)
      StateDir.compact(spark, d, upToBatch = 2)
      // a crash between the c-write and b-deletes leaves both present —
      // re-create an absorbed delta and assert it is NOT double-read
      StateDir.writeBatch(Seq(1L).toDF("v"), d, 0)
      StateDir.writeBatch(Seq(3L).toDF("v"), d, 2)
      val schema = new org.apache.spark.sql.types.StructType().add("v", "long")
      val vs = StateDir.read(spark, d, schema).collect().map(_.getLong(0)).sorted
      assert(vs.toSeq == Seq(1L, 2L, 3L), vs.toSeq)
      // the `< batchId` history rule: batch 2's replay does not see its
      // own delta
      val before2 = StateDir.read(spark, d, schema, beforeBatch = 2)
        .collect().map(_.getLong(0)).sorted
      assert(before2.toSeq == Seq(1L, 2L))
    } finally Replay.deleteRecursively(dir)
  }
}
