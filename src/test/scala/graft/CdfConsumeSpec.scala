package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{TxChangeFeed, TxTable}

/** The packaged CDF consumer ([[TxChangeFeed.consume]], r12 VERDICT
  * task 2): cursor = the silver's own txn high-water, fold window = the
  * change feed since it, and fold + cursor advance are ONE manifest
  * commit. Contracts under test: cadence independence (any poll
  * schedule converges to the same silver content), replay idempotence
  * (a re-polled window returns None and changes nothing), catch-up (a
  * lagging consumer folds one larger window, same answer), and
  * atomicity (a fold that throws leaves silver and cursor untouched —
  * there is no torn "merged but not advanced" state).
  */
class CdfConsumeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def withRoot(f: String => Unit): Unit = {
    val tmp = Files.createTempDirectory("graft_cdfconsume_")
    try f(tmp.toString)
    finally graft.streaming.Replay.deleteRecursively(tmp)
  }

  /** Signed additive fold: per (id % 3) group, count and amount sum. */
  private def fold(feed: DataFrame): DataFrame = {
    val sign = when(col("_change_type")
      .isin("insert", "update_postimage"), 1L).otherwise(-1L)
    feed.select(pmod(col("id"), lit(3)).as("g"), sign.as("sg"),
        col("amount"))
      .groupBy("g")
      .agg(sum(col("sg")).as("n"),
        sum(col("amount") * col("sg")).as("amount"))
  }

  /** The q181-shaped lifecycle on a toy (id, amount) table; returns the
    * head version.
    */
  private def lifecycle(bronze: String): Long = {
    import spark.implicits._
    TxTable.commit(spark, bronze,
      (1 to 24).map(i => (i.toLong, i * 10L)).toDF("id", "amount"),
      clusterBy = Some("id"))                                    // v0
    TxTable.commit(spark, bronze,
      (25 to 30).map(i => (i.toLong, i * 10L)).toDF("id", "amount"),
      TxTable.Append, clusterBy = Some("id"))                    // v1
    TxTable.deleteWhere(spark, bronze, col("id") % 5 === 0)      // v2 MoR
    TxTable.mergeByKeyPruned(spark, bronze,                      // v3 CoW
      Seq((3L, 999L), (31L, 310L)).toDF("id", "amount"), "id")
    TxTable.optimize(spark, bronze, 2, clusterBy = Seq("id"))    // v4
    TxTable.currentVersion(bronze).get
  }

  private def silverContent(root: String): Map[Long, (Long, Long)] =
    TxTable.read(spark, root).select("g", "n", "amount").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  /** Ground truth: the fold applied to bronze's final state directly. */
  private def expected(bronze: String): Map[Long, (Long, Long)] =
    TxTable.read(spark, bronze)
      .groupBy(pmod(col("id"), lit(3)).as("g"))
      .agg(count(lit(1)).as("n"), sum("amount").as("amount"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("per-version, every-other-version, and single-window cadences " +
      "all converge to the recompute-from-scratch answer") {
    withRoot { dir =>
      val bronze = s"$dir/bronze"
      val head = lifecycle(bronze)
      val perV = s"$dir/per_version"
      val everyOther = s"$dir/every_other"
      val oneShot = s"$dir/one_shot"
      (1L to head).foreach(h => TxChangeFeed.consume(spark, bronze, perV,
        "a", "id", "g", upTo = Some(h))(fold))
      (1L to head).filter(_ % 2 == 0).foreach(h =>
        TxChangeFeed.consume(spark, bronze, everyOther, "b", "id", "g",
          upTo = Some(h))(fold))
      // odd head: the trailing window catches every-other up
      TxChangeFeed.consume(spark, bronze, everyOther, "b", "id", "g")(fold)
      TxChangeFeed.consume(spark, bronze, oneShot, "c", "id", "g")(fold)
      val want = expected(bronze)
      assert(silverContent(perV) == want, "per-version cadence diverged")
      assert(silverContent(everyOther) == want,
        "every-other cadence diverged")
      assert(silverContent(oneShot) == want, "one-shot cadence diverged")
    }
  }

  test("a replayed poll returns None and leaves version, cursor, and " +
      "content unchanged; a later bronze commit resumes from the cursor") {
    import spark.implicits._
    withRoot { dir =>
      val bronze = s"$dir/bronze"
      val silver = s"$dir/silver"
      val head = lifecycle(bronze)
      assert(TxChangeFeed.consume(spark, bronze, silver, "a", "id", "g",
        upTo = Some(head))(fold).nonEmpty)
      val v = TxTable.currentVersion(silver).get
      val before = silverContent(silver)
      // replay the same window — and a no-op poll with no upTo at all
      assert(TxChangeFeed.consume(spark, bronze, silver, "a", "id", "g",
        upTo = Some(head))(fold).isEmpty)
      assert(TxChangeFeed.consume(spark, bronze, silver, "a", "id",
        "g")(fold).isEmpty)
      assert(TxTable.currentVersion(silver).get == v)
      assert(silverContent(silver) == before)
      // bronze advances; the next poll folds ONLY the new window
      TxTable.commit(spark, bronze,
        Seq((100L, 1000L), (101L, 1010L)).toDF("id", "amount"),
        TxTable.Append, clusterBy = Some("id"))
      assert(TxChangeFeed.consume(spark, bronze, silver, "a", "id",
        "g")(fold).nonEmpty)
      assert(silverContent(silver) == expected(bronze))
    }
  }

  test("independent consumers keep independent cursors on their own " +
      "silvers") {
    withRoot { dir =>
      val bronze = s"$dir/bronze"
      val head = lifecycle(bronze)
      val sa = s"$dir/sa"
      val sb = s"$dir/sb"
      TxChangeFeed.consume(spark, bronze, sa, "a", "id", "g",
        upTo = Some(1L))(fold)
      TxChangeFeed.consume(spark, bronze, sb, "b", "id", "g",
        upTo = Some(head))(fold)
      // a's cursor is still 1 — b's progress must not leak into it
      assert(TxTable.currentSnapshot(sa).get.txns("a") == 1L)
      assert(TxChangeFeed.consume(spark, bronze, sa, "a", "id",
        "g")(fold).nonEmpty)
      assert(silverContent(sa) == silverContent(sb))
    }
  }

  test("a fold that throws leaves the silver's version, cursor, and " +
      "content untouched (fold + cursor advance are one commit)") {
    withRoot { dir =>
      val bronze = s"$dir/bronze"
      val silver = s"$dir/silver"
      lifecycle(bronze)
      TxChangeFeed.consume(spark, bronze, silver, "a", "id", "g",
        upTo = Some(2L))(fold)
      val v = TxTable.currentVersion(silver).get
      val before = silverContent(silver)
      intercept[RuntimeException] {
        TxChangeFeed.consume(spark, bronze, silver, "a", "id", "g")(_ =>
          throw new RuntimeException("fold crashed"))
      }
      assert(TxTable.currentVersion(silver).get == v)
      assert(TxTable.currentSnapshot(silver).get.txns("a") == 2L)
      assert(silverContent(silver) == before)
      // the crashed window replays cleanly
      TxChangeFeed.consume(spark, bronze, silver, "a", "id", "g")(fold)
      assert(silverContent(silver) == expected(bronze))
    }
  }
}
