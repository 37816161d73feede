package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{TxChangeFeed, TxTable}

/** Change-feed reconstruction ([[TxChangeFeed.readChangeFeed]]): the
  * contracts the q181 oracle can't see — dataChange=false ops contribute
  * nothing, MoR deletes surface their exact rows, carryover rows of a
  * partial rewrite are eliminated, and the STRONG invariant: replaying
  * the feed over the starting snapshot reconstructs the ending snapshot
  * as a multiset, for every (from, to) window.
  */
class TxChangeFeedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def withRoot(f: String => Unit): Unit = {
    val tmp = Files.createTempDirectory("graft_txcdfspec_")
    try f(s"$tmp/t") finally graft.streaming.Replay.deleteRecursively(tmp)
  }

  private def content(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Int] =
    df.select("id", "amount").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap

  private def feed(root: String, from: Long, to: Long) =
    TxChangeFeed.readChangeFeed(spark, root, from, to, "id")

  /** Multiset replay: start + inserts + postimages - deletes - preimages. */
  private def replay(start: Map[(Long, Long), Int],
      changes: Seq[(String, Long, Long)]): Map[(Long, Long), Int] = {
    val m = scala.collection.mutable.Map(start.toSeq: _*).withDefaultValue(0)
    changes.foreach {
      case (ct, id, amount) if ct == "insert" || ct == "update_postimage" =>
        m((id, amount)) += 1
      case (ct, id, amount) =>
        assert(ct == "delete" || ct == "update_preimage", s"bad ct $ct")
        m((id, amount)) -= 1
        assert(m((id, amount)) >= 0, s"feed deleted absent row ($id,$amount)")
    }
    m.filter(_._2 > 0).toMap
  }

  private def collectFeed(root: String, from: Long,
      to: Long): Seq[(String, Long, Long)] =
    feed(root, from, to)
      .select("_change_type", "id", "amount").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("every (from, to) window's feed replays the start snapshot onto " +
      "the end snapshot exactly (append, MoR delete, merge, delete_range, " +
      "optimize lifecycle)") {
    import spark.implicits._
    withRoot { root =>
      TxTable.commit(spark, root,
        (1 to 24).map(i => (i.toLong, i * 10L)).toDF("id", "amount"),
        clusterBy = Some("id"))                                   // v0
      TxTable.commit(spark, root,
        (25 to 30).map(i => (i.toLong, i * 10L)).toDF("id", "amount"),
        TxTable.Append, clusterBy = Some("id"))                   // v1
      TxTable.deleteWhere(spark, root, col("id") % 5 === 0)       // v2 MoR
      TxTable.mergeByKeyPruned(spark, root,                       // v3 CoW
        Seq((3L, 999L), (31L, 310L)).toDF("id", "amount"), "id")
      TxTable.deleteRange(spark, root, "id", 7.0, 9.0)            // v4
      TxTable.optimize(spark, root, 2, clusterBy = Seq("id"))     // v5
      val head = TxTable.currentVersion(root).get
      assert(head == 5L)
      val snaps = (0L to head).map(v =>
        v -> content(TxTable.readVersion(spark, root, v))).toMap
      for (from <- 0L to head; to <- from to head) {
        val got = replay(snaps(from), collectFeed(root, from, to))
        assert(got == snaps(to), s"replay ($from,$to] diverged")
      }
    }
  }

  test("optimize and purge contribute zero feed rows; delete_mor rows " +
      "are exactly the deleted content") {
    import spark.implicits._
    withRoot { root =>
      TxTable.commit(spark, root,
        (1 to 20).map(i => (i.toLong, i * 10L)).toDF("id", "amount"),
        clusterBy = Some("id"))
      TxTable.deleteWhere(spark, root, col("id") <= 4)            // v1
      TxTable.purgeDeletes(spark, root)                           // v2
      TxTable.optimize(spark, root, 1, clusterBy = Seq("id"))     // v3
      assert(collectFeed(root, 1, 3).isEmpty)
      val del = collectFeed(root, 0, 1)
      assert(del.toSet ==
        (1L to 4L).map(i => ("delete", i, i * 10L)).toSet)
    }
  }

  test("carryover elimination: a merge updating one key in one file " +
      "feeds exactly one pre/post pair, not the rewritten file") {
    import spark.implicits._
    withRoot { root =>
      TxTable.commit(spark, root,
        (1 to 40).map(i => (i.toLong, i * 10L)).toDF("id", "amount"),
        clusterBy = Some("id"))
      val v1 = TxTable.mergeByKeyPruned(spark, root,
        Seq((17L, 777L)).toDF("id", "amount"), "id")
      val f = collectFeed(root, 0, v1)
      assert(f.toSet == Set(("update_preimage", 17L, 170L),
        ("update_postimage", 17L, 777L)))
    }
  }

  test("history surfaces the recorded op per version") {
    import spark.implicits._
    withRoot { root =>
      TxTable.commit(spark, root, Seq((1L, 10L)).toDF("id", "amount"))
      TxTable.commit(spark, root, Seq((2L, 20L)).toDF("id", "amount"),
        TxTable.Append)
      TxTable.deleteWhere(spark, root, col("id") === 1L)
      val ops = TxTable.history(spark, root).select("version", "op")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(ops == Map(0L -> "overwrite", 1L -> "append",
        2L -> "delete_mor"))
    }
  }
}
