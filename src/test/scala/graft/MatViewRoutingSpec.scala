package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TxTable
import graft.plans.MatViewRouting

class MatViewRoutingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten

  private def withTables(f: (String, String) => Unit): Unit = {
    val tmp = Files.createTempDirectory("graft_mvspec_")
    try f(s"$tmp/base", s"$tmp/mv")
    finally {
      MatViewRouting.clear()
      graft.streaming.Replay.deleteRecursively(tmp)
    }
  }

  private def publish(base: String, mv: String): Unit = {
    import spark.implicits._
    val rows = (1L to 100L).map(i =>
      (i, s"g${i % 3}", (i % 7).toDouble)).toDF("id", "grp", "x")
    TxTable.commit(spark, base, rows)
    TxTable.commit(spark, mv, TxTable.read(spark, base)
      .withColumn("b", pmod(col("id"), lit(4)))
      .groupBy("grp", "b")
      .agg(count(lit(1)).as("cnt"),
        sum(col("x").cast(DecimalType(18, 2)))
          .cast(DecimalType(18, 2)).as("sum_x")))
    MatViewRouting.enable(spark)
    MatViewRouting.register(TxTable.read(spark, base),
      TxTable.read(spark, mv), "grp", "cnt", Map("x" -> "sum_x"))
  }

  test("matching aggregate routes to the summary and answers exactly") {
    withTables { (base, mv) =>
      publish(base, mv)
      val q = TxTable.read(spark, base).groupBy("grp")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(DecimalType(18, 2))).as("sx"))
      assert(scanPaths(q).nonEmpty && scanPaths(q).forall(_.contains("/mv")))
      val got = q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue)).toSet
      // direct (unrouted) answer: fresh read AFTER a clear
      MatViewRouting.clear()
      val want = TxTable.read(spark, base).groupBy("grp")
        .agg(count(lit(1)).as("n"),
          sum(col("x").cast(DecimalType(18, 2))).as("sx"))
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getDecimal(2).doubleValue)).toSet
      assert(got == want)
    }
  }

  test("unsupported aggregate, wrong group col, or type-mismatched sum " +
      "leave the base scan untouched") {
    withTables { (base, mv) =>
      publish(base, mv)
      // avg is not decomposable through the registered mapping
      val avgQ = TxTable.read(spark, base).groupBy("grp")
        .agg(avg(col("x")).as("a"))
      assert(scanPaths(avgQ).forall(_.contains("/base")))
      // grouping by a different column
      val idQ = TxTable.read(spark, base).groupBy("id")
        .agg(count(lit(1)).as("n"))
      assert(scanPaths(idQ).forall(_.contains("/base")))
      // sum at a different input type than the summary column records
      val rawQ = TxTable.read(spark, base).groupBy("grp")
        .agg(sum(col("x")).as("sx")) // double, not DECIMAL(18,2)
      assert(scanPaths(rawQ).forall(_.contains("/base")))
    }
  }

  test("a new base commit stops the (snapshot-pinned) routing — no " +
      "stale answers") {
    import spark.implicits._
    withTables { (base, mv) =>
      publish(base, mv)
      TxTable.commit(spark, base,
        Seq((999L, "g0", 5.0)).toDF("id", "grp", "x"), TxTable.Append)
      val q = TxTable.read(spark, base).groupBy("grp")
        .agg(count(lit(1)).as("n"))
      assert(scanPaths(q).forall(_.contains("/base")))
      // and the answer includes the new row the summary has not seen
      assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
        .apply("g0") == 34L)
    }
  }
}
