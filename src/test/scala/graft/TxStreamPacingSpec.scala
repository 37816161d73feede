package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.GraftStreamShim
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxTable
import graft.sources.{TxDataSource, TxInitOffset, TxStreamSource}

/** Initial-snapshot pacing (`maxFilesPerTrigger`, Delta's option): the
  * first snapshot of a paced stream splits into file-bounded
  * micro-batches over [[TxInitOffset]] cursors instead of ONE batch
  * spanning the whole table. Pins the contracts that make it safe at
  * scale: exactly-once across slices (disjoint, union == snapshot, DVs
  * applied), bit-identical window replay, restart resume from the
  * durable pin + advisory idx, the idx-loss degrade (one unpaced
  * completion batch — never duplicates), the stale-advisory empty-batch
  * defense, and that the pin is immutable (a re-pinnable initial would
  * re-deliver rows).
  */
class TxStreamPacingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def withRoot(f: (String, String) => Unit): Unit = {
    val tmp = Files.createTempDirectory("graft_txpace_")
    try f(s"$tmp/t", s"$tmp/meta")
    finally graft.streaming.Replay.deleteRecursively(tmp)
  }

  /** 9 files × 10 rows, ids 0..89, one file per bucket. */
  private def seed(root: String): Unit = {
    val df = spark.range(90)
      .select(col("id"), (col("id") % 9).as("b"))
      .repartition(9) // round-robin: 9 non-empty files (9 distinct
      // hash keys would collide into fewer)
    TxTable.commit(spark, root, df)
    assert(TxTable.currentSnapshot(root).get.files.size == 9)
  }

  private def rows(df: DataFrame): Set[Long] =
    GraftStreamShim.asBatchFrame(df).select("id")
      .collect().map(_.getLong(0)).toSet

  private def mkSrc(root: String, meta: String,
      cap: Option[Long] = Some(2L),
      maxVersions: Option[Long] = None): TxStreamSource =
    new TxStreamSource(spark, root, TxTable.read(spark, root).schema,
      ignoreChanges = false, maxVersionsPerTrigger = maxVersions,
      startingVersion = None, metadataPath = Some(meta),
      maxFilesPerTrigger = cap)

  test("paced initial: disjoint slices, union == snapshot, replay " +
      "bit-identical, then the tail") {
    withRoot { (root, meta) =>
      seed(root)
      val src = mkSrc(root, meta)
      var start: Option[org.apache.spark.sql.execution.streaming.Offset] =
        None
      var seen = Set.empty[Long]
      var batches = 0
      var done = false
      while (!done) {
        val end = src.getOffset.get
        if (start.contains(end) || start.exists(_.json == end.json))
          done = true
        else {
          val got = rows(src.getBatch(start, end))
          assert(got.intersect(seen).isEmpty,
            s"slice re-delivered rows: ${got.intersect(seen)}")
          // replay of the same window must be bit-identical
          assert(rows(src.getBatch(start, end)) == got)
          seen ++= got
          batches += 1
          start = Some(end)
        }
      }
      assert(seen == (0L until 90L).toSet)
      assert(batches == 5, s"9 files at cap 2 should take 5 slices, got $batches")
      // tail: an append after the initial arrives as a plain version
      import spark.implicits._
      TxTable.commit(spark, root,
        Seq((100L, 1L)).toDF("id", "b"), TxTable.Append)
      val o = src.getOffset.get
      assert(o.isInstanceOf[LongOffset], "tail offsets are plain versions")
      assert(rows(src.getBatch(start, o)) == Set(100L))
    }
  }

  test("restart mid-initial resumes pacing from the durable cursors; " +
      "idx loss degrades to one unpaced completion batch, never a dup") {
    withRoot { (root, meta) =>
      seed(root)
      val s1 = mkSrc(root, meta)
      val o1 = s1.getOffset.get
      assert(o1.isInstanceOf[TxInitOffset])
      val got1 = rows(s1.getBatch(None, o1))
      assert(got1.nonEmpty)
      // "restart": a fresh instance over the same metadata dir resumes
      // at the recorded idx — the next offset extends o1, not file 0
      val s2 = mkSrc(root, meta)
      val o2 = s2.getOffset.get.asInstanceOf[TxInitOffset]
      assert(o2.fileIndex == 4L, s"expected resume at file 4, got $o2")
      val got2 = rows(s2.getBatch(Some(o1), o2))
      assert(got2.intersect(got1).isEmpty && got2.nonEmpty)
      // lose the ADVISORY idx: a fresh instance finishes the initial in
      // one plain-version batch — correct, just unpaced — and the
      // engine's start offset keeps it duplicate-free
      java.nio.file.Files.delete(
        java.nio.file.Paths.get(meta, "graft-init-idx"))
      val s3 = mkSrc(root, meta)
      val o3 = s3.getOffset.get
      assert(o3.isInstanceOf[LongOffset],
        "idx-lost remainder must be a plain version offset")
      val got3 = rows(s3.getBatch(Some(o2), o3))
      assert(got3 == (0L until 90L).toSet -- got1 -- got2)
    }
  }

  test("stale advisory idx after an unpaced completion: a composite end " +
      "behind a plain committed start emits nothing") {
    withRoot { (root, meta) =>
      seed(root)
      val src = mkSrc(root, meta)
      val o1 = src.getOffset.get // pins v0
      assert(o1.isInstanceOf[TxInitOffset])
      val v0 = o1.asInstanceOf[TxInitOffset].version
      // engine committed a plain offset covering v0 entirely; a stale
      // composite end must not re-slice the pinned snapshot
      assert(rows(src.getBatch(Some(LongOffset(v0)),
        new TxInitOffset(v0, 2L))).isEmpty)
    }
  }

  test("no pin when unpaced, when the snapshot fits one trigger, or " +
      "when startingVersion asked for tail-only; pin file is immutable") {
    withRoot { (root, meta) =>
      seed(root)
      // option absent: plain full-snapshot first batch
      val plain = mkSrc(root, meta + "_a", cap = None)
      assert(plain.getOffset.get.isInstanceOf[LongOffset])
      // cap >= files: pacing pointless, no pin
      val wide = mkSrc(root, meta + "_b", cap = Some(9L))
      assert(wide.getOffset.get.isInstanceOf[LongOffset])
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(meta + "_b", "graft-init-pin")))
      // tail-only stream never paces an initial it does not read
      val tail = new TxStreamSource(spark, root,
        TxTable.read(spark, root).schema, ignoreChanges = false,
        startingVersion = Some(0L), metadataPath = Some(meta + "_c"),
        maxFilesPerTrigger = Some(2L))
      assert(tail.getOffset.get.isInstanceOf[LongOffset])
      // immutability: ensurePin adopts an existing pin, never rewrites
      assert(TxDataSource.InitCursor.ensurePin(meta + "_d", 3L, 7L)
        .contains((3L, 7L)))
      assert(TxDataSource.InitCursor.ensurePin(meta + "_d", 9L, 11L)
        .contains((3L, 7L)))
    }
  }

  test("deletion vectors of the pinned version apply inside every slice") {
    withRoot { (root, meta) =>
      seed(root)
      TxTable.deleteWhere(spark, root, col("id") === 7L)
      val src = mkSrc(root, meta)
      var start: Option[org.apache.spark.sql.execution.streaming.Offset] =
        None
      var seen = Set.empty[Long]
      var guard = 0
      while (guard < 10 && {
        val end = src.getOffset.get
        val fresh = !start.exists(_.json == end.json)
        if (fresh) { seen ++= rows(src.getBatch(start, end)); start = Some(end) }
        fresh
      }) guard += 1
      assert(seen == (0L until 90L).toSet - 7L,
        "the MoR-deleted row leaked into a paced slice")
    }
  }

  test("Trigger.AvailableNow over a paced stream: runs resume at the " +
      "recorded cursor and converge exactly-once (Spark's v1 wrapper " +
      "latches ONE offset per run, so a paced backfill takes several " +
      "AvailableNow runs — rerun until caught up, or use a " +
      "processing-time trigger for one-shot backfills)") {
    withRoot { (root, meta) =>
      seed(root)
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val tgt = s"${meta}_target"
      var runs = 0
      def caught: Boolean =
        TxTable.currentSnapshot(tgt).exists { _ =>
          TxTable.read(ss, tgt).count() == 90L
        }
      while (!caught && runs < 12) {
        val q = ss.readStream.format("tx")
          .option("maxFilesPerTrigger", "3").load(root)
          .writeStream.format("tx")
          .option("checkpointLocation", s"$meta/ckpt_an")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(tgt)
        q.awaitTermination()
        runs += 1
      }
      assert(caught, s"paced AvailableNow backfill never converged ($runs runs)")
      assert(runs > 1, "expected the paced backfill to span several " +
        "AvailableNow runs (one latched offset per run)")
      val got = TxTable.read(ss, tgt).select("id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == (0L until 90L).toSeq, "lost or duplicated rows")
    }
  }

  test("end-to-end: a paced backfill through a real streaming query " +
      "delivers the snapshot exactly once across file-bounded batches") {
    withRoot { (root, meta) =>
      seed(root)
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "4")
      val sink = s"pace_sink_${System.identityHashCode(this)}"
      val q = ss.readStream.format("tx")
        .option("maxFilesPerTrigger", "2").load(root)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", s"$meta/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
      val got = ss.table(sink).select("id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == (0L until 90L).toSeq,
        "paced backfill lost or duplicated rows")
      ss.catalog.dropTempView(sink)
    }
  }
}
