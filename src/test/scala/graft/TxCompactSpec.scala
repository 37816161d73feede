package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{TxChangeFeed, TxTable}

/** Targeted small-file compaction ([[TxTable.compactSmall]]): only
  * sub-threshold files rewrite; healthy files carry with their
  * stats/blooms; DV-bearing files compact regardless of size (doubling
  * as purge); content identical; the change feed sees nothing.
  */
class TxCompactSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def withRoot(f: String => Unit): Unit = {
    val tmp = Files.createTempDirectory("graft_txcompact_")
    try f(s"$tmp/t") finally graft.streaming.Replay.deleteRecursively(tmp)
  }

  private def ids(root: String): Set[Long] =
    TxTable.read(spark, root).select("id").collect().map(_.getLong(0)).toSet

  /** One big file (50k rows) + N one-row appends — sizes far apart, so a
    * threshold between them is robust on any parquet encoder.
    */
  private def seed(root: String, tail: Int): Long = {
    import spark.implicits._
    TxTable.commit(spark, root,
      (1 to 50000).map(i => (i.toLong, s"s$i")).toDF("id", "s")
        .repartition(1), clusterBy = None, statsCols = Seq("id"))
    (1 to tail).foreach { k =>
      TxTable.commit(spark, root,
        Seq((100000L + k, s"t$k")).toDF("id", "s"), TxTable.Append,
        statsCols = Seq("id"))
    }
    Files.size(Paths.get(root,
      TxTable.currentSnapshot(root).get.files
        .maxBy(f => Files.size(Paths.get(root, f)))))
  }

  test("only sub-threshold files rewrite; the large file carries with " +
      "its stats; content identical; feed sees nothing") {
    withRoot { root =>
      val bigSize = seed(root, tail = 6)
      val before = TxTable.currentSnapshot(root).get
      assert(before.files.size == 7)
      val big = before.files.maxBy(f => Files.size(Paths.get(root, f)))
      val expected = ids(root)
      val v = TxTable.compactSmall(spark, root, minBytes = bigSize / 2)
      val after = TxTable.snapshotAt(root, v)
      assert(after.files.contains(big), "large file must carry untouched")
      assert(after.files.size < before.files.size)
      assert(after.stats.contains(big), "carried file keeps its stats")
      assert(ids(root) == expected)
      assert(TxChangeFeed.readChangeFeed(spark, root, v - 1, v, "id")
        .count() == 0L, "compaction is dataChange=false in the feed")
      // idempotent: a second pass finds at most one healthy tail file
      assert(TxTable.compactSmall(spark, root, minBytes = bigSize / 2) == v)
    }
  }

  test("a DV-bearing file compacts regardless of size (doubles as purge)") {
    withRoot { root =>
      seed(root, tail = 0)
      TxTable.deleteWhere(spark, root, col("id") <= 10)
      val expected = ids(root)
      val v = TxTable.compactSmall(spark, root, minBytes = 1L)
      val after = TxTable.snapshotAt(root, v)
      assert(after.dvs.isEmpty, "compaction materialized the DVs")
      assert(ids(root) == expected && !ids(root).contains(1L))
    }
  }

  test("no-op when nothing qualifies (single small file, no DVs)") {
    import spark.implicits._
    withRoot { root =>
      TxTable.commit(spark, root, Seq((1L, "a")).toDF("id", "s"))
      assert(TxTable.compactSmall(spark, root, minBytes = 1L << 20) == 0L)
      assert(TxTable.versions(root) == Seq(0L))
    }
  }
}
