package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TxTable

/** CHECK constraints ([[TxTable.addCheck]]): commit-time enforcement at
  * every write path, SQL-standard NULL-passes semantics, inductive
  * validity (existing data validated at add time, every later write
  * validated before publish), and the abort contract (a rejected write
  * publishes nothing — the head version and content are untouched).
  */
class TxCheckSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def withRoot(f: String => Unit): Unit = {
    val tmp = Files.createTempDirectory("graft_txcheck_")
    try f(s"$tmp/t") finally graft.streaming.Replay.deleteRecursively(tmp)
  }

  private def seed(root: String): Unit = {
    import spark.implicits._
    TxTable.commit(spark, root,
      (1 to 20).map(i => (i.toLong, i * 10L)).toDF("id", "amount"),
      clusterBy = Some("id"))
    ()
  }

  test("addCheck validates existing content; a violated add is rejected " +
      "without publishing") {
    withRoot { root =>
      seed(root)
      TxTable.addCheck(spark, root, "amount_pos", "amount > 0")
      assert(TxTable.currentSnapshot(root).get.checks ==
        Seq("amount_pos" -> "amount > 0"))
      val ex = intercept[IllegalArgumentException](
        TxTable.addCheck(spark, root, "amount_big", "amount > 100"))
      assert(ex.getMessage.contains("amount_big"))
      assert(TxTable.currentSnapshot(root).get.checks.size == 1)
      intercept[IllegalArgumentException](
        TxTable.addCheck(spark, root, "amount_pos", "amount > 1"))
    }
  }

  test("violating append/overwrite/merge is aborted; head version and " +
      "content untouched; conforming writes pass") {
    import spark.implicits._
    withRoot { root =>
      seed(root)
      TxTable.addCheck(spark, root, "amount_pos", "amount > 0")
      val v1 = TxTable.currentVersion(root).get
      intercept[IllegalArgumentException](TxTable.commit(spark, root,
        Seq((21L, -5L)).toDF("id", "amount"), TxTable.Append))
      intercept[IllegalArgumentException](TxTable.commit(spark, root,
        Seq((1L, 0L)).toDF("id", "amount"), TxTable.Overwrite))
      intercept[IllegalArgumentException](TxTable.mergeByKeyPruned(spark,
        root, Seq((3L, -1L)).toDF("id", "amount"), "id"))
      assert(TxTable.currentVersion(root).get == v1)
      assert(TxTable.read(spark, root).count() == 20L)
      // conforming writes still land, and the constraint carries forward
      TxTable.commit(spark, root, Seq((21L, 5L)).toDF("id", "amount"),
        TxTable.Append)
      assert(TxTable.currentSnapshot(root).get.checks.nonEmpty)
      assert(TxTable.read(spark, root).count() == 21L)
    }
  }

  test("additive merge validates the COMBINED values (a sum crossing the " +
      "bound aborts)") {
    import spark.implicits._
    withRoot { root =>
      seed(root)
      TxTable.addCheck(spark, root, "amount_cap", "amount <= 1000")
      // id=20 holds 200; adding 900 pushes the combined row to 1100
      intercept[IllegalArgumentException](TxTable.mergeAdditive(spark,
        root, Seq((20L, 900L)).toDF("id", "amount"), "id"))
      // adding 700 lands at 900 — fine
      TxTable.mergeAdditive(spark, root,
        Seq((20L, 700L)).toDF("id", "amount"), "id")
      assert(TxTable.read(spark, root).filter(col("id") === 20L)
        .head().getLong(1) == 900L)
    }
  }

  test("an additive-evolution append missing the checked column passes " +
      "(reads as NULL everywhere) instead of crashing unresolved; one " +
      "carrying a violating value still aborts") {
    import spark.implicits._
    withRoot { root =>
      seed(root)
      TxTable.addCheck(spark, root, "amount_pos", "amount > 0")
      // narrower batch: no amount column at all -> NULL under mergeSchema
      TxTable.commit(spark, root, Seq((99L, "note")).toDF("id", "tag"),
        TxTable.Append)
      assert(TxTable.read(spark, root).filter(col("id") === 99L)
        .select("amount").head().isNullAt(0))
      intercept[IllegalArgumentException](TxTable.commit(spark, root,
        Seq((100L, -3L, "x")).toDF("id", "amount", "tag"), TxTable.Append))
    }
  }

  test("NULL check values pass (SQL standard); maintenance carries " +
      "constraints through delete/optimize/purge") {
    import spark.implicits._
    withRoot { root =>
      TxTable.commit(spark, root,
        Seq((1L, Some(10L)), (2L, None), (3L, Some(30L)))
          .toDF("id", "amount"), clusterBy = Some("id"))
      TxTable.addCheck(spark, root, "amount_pos", "amount > 0") // null row passes
      TxTable.deleteWhere(spark, root, col("id") === 3L)
      TxTable.purgeDeletes(spark, root)
      TxTable.optimize(spark, root, 1, clusterBy = Seq("id"))
      TxTable.deleteRange(spark, root, "id", 0.0, 0.5) // no-op range
      assert(TxTable.currentSnapshot(root).get.checks ==
        Seq("amount_pos" -> "amount > 0"))
      // still enforced after the maintenance chain
      intercept[IllegalArgumentException](TxTable.commit(spark, root,
        Seq((9L, Some(-1L))).toDF("id", "amount"), TxTable.Append))
    }
  }
}
