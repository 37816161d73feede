package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{TxTable, Upsert}

class TxTableSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def withRoot(f: String => Unit): Unit = {
    val tmp = Files.createTempDirectory("graft_txspec_")
    try f(s"$tmp/t") finally graft.streaming.Replay.deleteRecursively(tmp)
  }

  private def rows(root: String): Set[(Long, String)] =
    TxTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("commit/read round trip, dense versions, pinned snapshot read") {
    import spark.implicits._
    withRoot { root =>
      assert(TxTable.currentVersion(root).isEmpty)
      intercept[java.io.IOException](TxTable.read(spark, root))
      val v0 = TxTable.commit(spark, root,
        Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
      assert(v0 == 0L)
      assert(rows(root) == Set((1L, "a"), (2L, "b")))
      // a snapshot DataFrame resolved BEFORE a later commit still reads
      // the old version (explicit file list, not directory listing)
      val pinned = TxTable.read(spark, root)
      TxTable.commit(spark, root, Seq((9L, "z")).toDF("id", "s"))
      assert(pinned.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
      assert(TxTable.versions(root) == Seq(0L, 1L))
    }
  }

  test("overwrite advances the head; time travel reads any retained version") {
    import spark.implicits._
    withRoot { root =>
      TxTable.commit(spark, root, Seq((1L, "old")).toDF("id", "s"))
      TxTable.commit(spark, root, Seq((2L, "new")).toDF("id", "s"))
      assert(rows(root) == Set((2L, "new")))
      assert(TxTable.readVersion(spark, root, 0L).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet == Set((1L, "old")))
    }
  }

  test("append references the parent's files — no data rewrite") {
    import spark.implicits._
    withRoot { root =>
      TxTable.commit(spark, root, Seq((1L, "a")).toDF("id", "s"))
      val parentFiles = TxTable.currentSnapshot(root).get.files.toSet
      TxTable.commit(spark, root, Seq((2L, "b")).toDF("id", "s"),
        TxTable.Append)
      val head = TxTable.currentSnapshot(root).get.files.toSet
      assert(parentFiles.subsetOf(head), "append dropped parent files")
      assert(head.size > parentFiles.size)
      assert(rows(root) == Set((1L, "a"), (2L, "b")))
    }
  }

  test("mergeByKey publishes exactly Upsert.mergeByKey of the head") {
    import spark.implicits._
    withRoot { root =>
      val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      val upd = Seq((2L, "B"), (4L, "D")).toDF("id", "s")
      TxTable.commit(spark, root, base)
      TxTable.mergeByKey(spark, root, upd, Seq("id"))
      val expect = Upsert.mergeByKey(base, upd, Seq("id")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows(root) == expect)
      assert(rows(root) == Set((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D")))
    }
  }

  test("a crashed writer's data dir is invisible; vacuum reclaims it") {
    import spark.implicits._
    withRoot { root =>
      TxTable.commit(spark, root, Seq((1L, "a")).toDF("id", "s"))
      // simulate a writer that died before publishing its manifest
      Seq((99L, "dead")).toDF("id", "s")
        .write.parquet(s"$root/data/w-crashed")
      assert(rows(root) == Set((1L, "a")))
      TxTable.vacuum(root)
      assert(!Files.exists(Paths.get(root, "data", "w-crashed")))
      assert(rows(root) == Set((1L, "a")))
    }
  }

  test("vacuum drops old versions but keeps retained ones readable") {
    import spark.implicits._
    withRoot { root =>
      TxTable.commit(spark, root, Seq((1L, "v0")).toDF("id", "s"))
      TxTable.commit(spark, root, Seq((2L, "v1")).toDF("id", "s"))
      TxTable.commit(spark, root, Seq((3L, "v2")).toDF("id", "s"))
      TxTable.vacuum(root, keepVersions = 2)
      assert(TxTable.versions(root) == Seq(1L, 2L))
      assert(TxTable.readVersion(spark, root, 1L).collect()
        .map(_.getLong(0)).toSet == Set(2L))
      assert(rows(root) == Set((3L, "v2")))
      intercept[Exception](TxTable.readVersion(spark, root, 0L).collect())
    }
  }

  test("corrupt manifest fails loudly, never silently skips") {
    import spark.implicits._
    withRoot { root =>
      TxTable.commit(spark, root, Seq((1L, "a")).toDF("id", "s"))
      Files.write(Paths.get(root, "_manifests", "v000000001.txt"),
        java.util.Arrays.asList("graft-txtable-v1", "data/w-x/p.parquet"))
      val ex = intercept[java.io.IOException](TxTable.read(spark, root))
      assert(ex.getMessage.contains("corrupt"))
    }
  }

  test("concurrent append committers all land; no lost update") {
    import spark.implicits._
    withRoot { root =>
      TxTable.commit(spark, root, Seq((0L, "base")).toDF("id", "s"))
      val threads = (1 to 4).map { i =>
        new Thread(() => {
          TxTable.commit(spark, root, Seq((i.toLong, s"t$i")).toDF("id", "s"),
            TxTable.Append)
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(TxTable.versions(root) == (0L to 4L))
      assert(rows(root) ==
        Set((0L, "base")) ++ (1 to 4).map(i => (i.toLong, s"t$i")))
    }
  }

  test("txn commit is idempotent per (appId, batchId) — replayed batch no-ops") {
    import spark.implicits._
    withRoot { root =>
      TxTable.commit(spark, root, Seq((0L, "base")).toDF("id", "s"))
      val v1 = TxTable.commit(spark, root, Seq((1L, "b0")).toDF("id", "s"),
        TxTable.Append, Some(("app", 0L)))
      // at-least-once replay of the same batch: same app, same batch id
      val v1r = TxTable.commit(spark, root, Seq((1L, "b0")).toDF("id", "s"),
        TxTable.Append, Some(("app", 0L)))
      assert(v1 == 1L && v1r == 1L, s"replay minted a new version: $v1r")
      assert(TxTable.versions(root) == Seq(0L, 1L))
      assert(rows(root) == Set((0L, "base"), (1L, "b0")))
      // the NEXT batch still commits
      val v2 = TxTable.commit(spark, root, Seq((2L, "b1")).toDF("id", "s"),
        TxTable.Append, Some(("app", 1L)))
      assert(v2 == 2L)
      assert(rows(root) ==
        Set((0L, "base"), (1L, "b0"), (2L, "b1")))
      // a DIFFERENT app's batch 0 is not confused with ours
      val v3 = TxTable.commit(spark, root, Seq((3L, "x0")).toDF("id", "s"),
        TxTable.Append, Some(("other", 0L)))
      assert(v3 == 3L)
      assert(TxTable.currentSnapshot(root).get.txns ==
        Map("app" -> 1L, "other" -> 0L))
    }
  }

  test("streamAppend double-fold: state and answer unchanged on replay") {
    import spark.implicits._
    withRoot { root =>
      TxTable.commit(spark, root, spark.emptyDataset[(Long, String)]
        .toDF("id", "s"))
      val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      val b1 = Seq((3L, "c")).toDF("id", "s")
      TxTable.streamAppend(root, "q")(b0, 0L)
      TxTable.streamAppend(root, "q")(b0, 0L) // crash-replay of batch 0
      TxTable.streamAppend(root, "q")(b1, 1L)
      TxTable.streamAppend(root, "q")(b1, 1L) // and of batch 1
      assert(TxTable.versions(root) == Seq(0L, 1L, 2L),
        "a replayed batch minted an extra version")
      assert(rows(root) == Set((1L, "a"), (2L, "b"), (3L, "c")))
    }
  }

  test("clustered commit records footer stats; pruning drops dead files only") {
    import spark.implicits._
    withRoot { root =>
      val df = (1 to 800).map(i => (i.toLong, i * 10.0)).toDF("id", "v")
      TxTable.commit(spark, root, df, TxTable.Overwrite,
        clusterBy = Some("v"))
      val snap = TxTable.currentSnapshot(root).get
      assert(snap.files.size > 1, "need multiple files to prove pruning")
      assert(snap.stats.keySet == snap.files.toSet,
        "every clustered file should carry stats")
      // a selective range must prune most range-clustered files...
      val pruned = TxTable.prunedFiles(root, "v", 100.0, 200.0)
      assert(pruned.size < snap.files.size,
        s"no pruning: ${pruned.size} of ${snap.files.size}")
      // ...and the pruned read must equal the full filtered read exactly
      val got = TxTable.readPruned(spark, root, "v", 100.0, 200.0)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val full = TxTable.read(spark, root)
        .filter(col("v") >= 100.0 && col("v") <= 200.0)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(got == full && got.size == 11)
      // stats on an unrelated column never prune
      assert(TxTable.prunedFiles(root, "id", 100.0, 200.0).size
        == snap.files.size)
      // append WITHOUT clustering: new files carry no stats, survive all
      // pruning, parent stats persist
      TxTable.commit(spark, root, Seq((9001L, 150.0)).toDF("id", "v"),
        TxTable.Append)
      val got2 = TxTable.readPruned(spark, root, "v", 100.0, 200.0)
        .collect().map(_.getLong(0)).toSet
      assert(got2 == full.map(_._1) + 9001L)
    }
  }

  test("concurrent serializable merges: both key updates survive") {
    import spark.implicits._
    withRoot { root =>
      TxTable.commit(spark, root, Seq((1L, "a"), (2L, "b")).toDF("id", "s"))
      val t1 = new Thread(() => {
        TxTable.mergeByKey(spark, root,
          Seq((1L, "A")).toDF("id", "s"), Seq("id"))
      })
      val t2 = new Thread(() => {
        TxTable.mergeByKey(spark, root,
          Seq((2L, "B")).toDF("id", "s"), Seq("id"))
      })
      t1.start(); t2.start(); t1.join(); t2.join()
      // serializable: the loser recomputed on the winner's output, so
      // BOTH updates are in the final head regardless of commit order
      assert(rows(root) == Set((1L, "A"), (2L, "B")))
    }
  }
}
