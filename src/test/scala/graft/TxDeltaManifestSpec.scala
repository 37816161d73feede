package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxTable

/** Format-10 DELTA manifests — the answer to the flat manifest's O(F)
  * driver-side term: once a parent snapshot is big enough, a commit
  * writes only `base`/`drop`/`redo` + changed lines instead of
  * re-rendering every file's metadata, and a full CHECKPOINT manifest
  * lands every `checkpointEvery` deltas so read-side resolution stays
  * bounded. The load-bearing claims under test:
  *
  *   - ROUND-TRIP: a snapshot resolved through a delta chain is
  *     field-for-field EQUAL to the same version materialized as a
  *     full manifest (tryPublish is the one rendering site for both);
  *   - cadence: depth climbs 1 per delta and snaps to 0 at the
  *     checkpoint; overwrite-shaped publishes choose the full render
  *     (a delta would be larger);
  *   - vacuum materializes kept deltas whose base drops, preserving
  *     the commit ts (the time axis), and dropped versions still fail
  *     loudly;
  *   - clone of a delta head takes the materialized path and reads
  *     identically.
  *
  * All tests force tiny tables onto the delta path through the
  * per-THREAD threshold override — never a session/global knob (the
  * parallel-suites-share-one-session rule).
  */
class TxDeltaManifestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def withRoot(f: String => Unit): Unit = {
    val tmp = Files.createTempDirectory("graft_txdelta_")
    try f(s"$tmp/t") finally graft.streaming.Replay.deleteRecursively(tmp)
  }

  private def withDelta[A](every: Int = 16)(f: => A): A = {
    TxTable.deltaThresholdOverride.set(0)
    TxTable.checkpointEveryOverride.set(every)
    try f finally {
      TxTable.deltaThresholdOverride.remove()
      TxTable.checkpointEveryOverride.remove()
    }
  }

  private def manifestText(root: String, v: Long): String =
    new String(Files.readAllBytes(
      Paths.get(root, "_manifests", f"v$v%09d.txt")),
      java.nio.charset.StandardCharsets.UTF_8)

  test("round-trip: chain-resolved snapshot == materialized full render " +
      "across the DML zoo") {
    withRoot { root =>
      import spark.implicits._
      withDelta() {
        TxTable.commit(spark, root,
          spark.range(0, 40L).selectExpr("id AS k", "id % 7 AS v",
            "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'fr' END AS lang"),
          statsCols = Seq("k", "lang"), sumCols = Seq("v"),
          bloomCols = Seq("k"))
        TxTable.commit(spark, root,
          spark.range(40L, 60L).selectExpr("id AS k", "id % 7 AS v",
            "'de' AS lang"),
          TxTable.Append, statsCols = Seq("k", "lang"), sumCols = Seq("v"))
        TxTable.deleteWhere(spark, root, col("k") === 5L) // MoR: redo line
        TxTable.addCheck(spark, root, "k_nonneg", "k >= 0")
        TxTable.renameColumn(spark, root, "v", "w")
        TxTable.mergeByKeyPruned(spark, root,
          Seq((3L, 99L, "en"), (100L, 1L, "zh")).toDF("k", "w", "lang"), "k")
        TxTable.updateWhere(spark, root, col("k") === 7L,
          Seq("w" -> lit(555L)))
        TxTable.purgeDeletes(spark, root)
        TxTable.deleteRange(spark, root, "k", 50.0, 52.0)
      }
      val head = TxTable.currentVersion(root).get
      assert(head >= 8L)
      // at least one real delta landed (appends/MoR deletes are the
      // canonical small-change commits)
      assert((1L to head).exists(v => TxTable.manifestDepth(root, v) > 0),
        "no version took the delta path — the override did not bite")
      // EVERY version: resolve through the chain, then materialize and
      // re-parse — field-for-field equality or the two grammar sites
      // drifted
      (0L to head).foreach { v =>
        val viaChain = TxTable.snapshotAt(root, v)
        TxTable.materializeManifest(root, v)
        assert(TxTable.manifestDepth(root, v) == 0)
        val viaFull = TxTable.snapshotAt(root, v)
        assert(viaFull == viaChain, s"round-trip drift at v$v")
      }
      // and the data reads exactly: 0..49 minus k=5 delete... purge,
      // minus 50..52 range delete, with k=3 merged, k=7 updated, 100 added
      val got = TxTable.read(spark, root)
        .select("k", "w").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toMap
      assert(!got.contains(5L) && !got.contains(50L) && !got.contains(52L))
      assert(got(3L) == 99L && got(7L) == 555L && got(100L) == 1L)
      assert(got.size == 60 - 1 - 3 + 1)
    }
  }

  test("cadence: depth climbs per delta, checkpoints at the cap; " +
      "overwrite picks the full render") {
    withRoot { root =>
      withDelta(every = 2) {
        // a 20-file base: the size gate (delta must be < half the full
        // render) needs real asymmetry — on a 2-file table a delta is
        // legitimately NOT smaller and the full render wins
        TxTable.commit(spark, root,
          spark.range(0, 200L).selectExpr("id AS k").repartition(20))
        (1 to 6).foreach { i =>
          TxTable.commit(spark, root,
            spark.range(200L + i * 10L, 200L + i * 10L + 10L)
              .selectExpr("id AS k").coalesce(1), TxTable.Append)
        }
        assert((0L to 6L).map(TxTable.manifestDepth(root, _)) ==
          Seq(0, 1, 2, 0, 1, 2, 0))
        assert(manifestText(root, 1L).contains("base 0 1"))
        assert(manifestText(root, 2L).contains("base 1 2"))
        assert(!manifestText(root, 3L).contains("base "))
        // overwrite: every parent file drops — the size gate picks full
        TxTable.commit(spark, root,
          spark.range(0, 5L).selectExpr("id AS k"), TxTable.Overwrite)
        assert(TxTable.manifestDepth(root, 7L) == 0)
        assert(!manifestText(root, 7L).contains("base "))
        assert(TxTable.read(spark, root).count() == 5L)
      }
    }
  }

  test("vacuum materializes kept deltas whose base drops; commit ts " +
      "survives; dropped versions fail loudly; connector reads the chain") {
    withRoot { root =>
      withDelta(every = 16) {
        TxTable.commit(spark, root,
          spark.range(0, 200L).selectExpr("id AS k").repartition(20))
        (1 to 5).foreach { i =>
          TxTable.commit(spark, root,
            spark.range(200L + i * 10L, 200L + i * 10L + 10L)
              .selectExpr("id AS k").coalesce(1), TxTable.Append)
        }
      }
      // v0 full, v1..v5 deltas of climbing depth
      assert(TxTable.manifestDepth(root, 5L) == 5)
      val tsBefore = TxTable.commitTimeMillis(root, 4L)
      // connector read resolves the whole chain
      assert(spark.read.format("tx").load(root).count() == 250L)
      TxTable.vacuum(root, keepVersions = 2)
      // kept = v4, v5; v4's base v3 dropped → v4 materialized in place
      assert(TxTable.versions(root) == Seq(4L, 5L))
      assert(TxTable.manifestDepth(root, 4L) == 0,
        "a kept delta whose base dropped must materialize")
      assert(TxTable.commitTimeMillis(root, 4L) == tsBefore,
        "materialization must preserve the commit ts (the time axis)")
      // v5 stays a delta over the now-materialized v4 — reads exact
      assert(TxTable.manifestDepth(root, 5L) == 5)
      assert(TxTable.read(spark, root).count() == 250L)
      assert(TxTable.readVersion(spark, root, 4L).count() == 240L)
      // below the horizon: loud, never silent
      intercept[Exception](TxTable.readVersion(spark, root, 2L))
    }
  }

  test("clone of a delta head: materialized path, foreign files, " +
      "identical rows") {
    val tmp = Files.createTempDirectory("graft_txdeltaclone_")
    try {
      val src = s"$tmp/src"
      val tgt = s"$tmp/tgt"
      import spark.implicits._
      withDelta() {
        TxTable.commit(spark, src,
          spark.range(0, 30L).selectExpr("id AS k", "id % 3 AS v"),
          statsCols = Seq("k"))
        TxTable.commit(spark, src,
          spark.range(30L, 40L).selectExpr("id AS k", "id % 3 AS v"),
          TxTable.Append, statsCols = Seq("k"))
        TxTable.deleteWhere(spark, src, col("k") === 2L)
      }
      assert(TxTable.manifestDepth(src, 2L) > 0, "head must be a delta")
      TxTable.clone(spark, src, tgt)
      val c = TxTable.currentSnapshot(tgt).get
      assert(c.files.nonEmpty && c.files.forall(_.startsWith("/")))
      assert(c.txns.isEmpty)
      assert(TxTable.manifestDepth(tgt, 0L) == 0)
      val s0 = TxTable.snapshotAt(src, 2L)
      assert(c.dvs.values.flatten.size == s0.dvs.values.flatten.size)
      assert(TxTable.read(spark, tgt).collect().map(_.getLong(0)).toSet ==
        TxTable.read(spark, src).collect().map(_.getLong(0)).toSet)
    } finally graft.streaming.Replay.deleteRecursively(tmp)
  }
}
