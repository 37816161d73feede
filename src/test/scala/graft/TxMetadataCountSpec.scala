package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxTable

/** [[graft.plans.TxMetadataCount]]: an unfiltered global COUNT(*) over
  * a clean tx snapshot optimizes to a LocalRelation fed by manifest
  * `rows` lines (zero scans); every soundness gate degrades to the
  * real scan — never to a wrong number.
  */
class TxMetadataCountSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def withRoot(f: String => Unit): Unit = {
    val tmp = Files.createTempDirectory("graft_txmeta_")
    try f(s"$tmp/t") finally graft.streaming.Replay.deleteRecursively(tmp)
  }

  private def isMetadataAnswered(df: DataFrame): Boolean = {
    val opt = df.queryExecution.optimizedPlan
    opt.collect { case lr: LogicalRelation => lr }.isEmpty &&
      opt.collect { case l: LocalRelation => l }.nonEmpty
  }

  test("unfiltered COUNT(*) answers from the manifest — no relation in the optimized plan") {
    withRoot { root =>
      import spark.implicits._
      TxTable.commit(spark, root,
        spark.range(0, 123L).selectExpr("id", "id % 5 AS g"))
      TxTable.commit(spark, root,
        spark.range(200, 277L).selectExpr("id", "id % 5 AS g"),
        TxTable.Append)
      val cnt = spark.read.format("tx").load(root)
        .agg(count(lit(1)).as("n"))
      assert(isMetadataAnswered(cnt), s"still scans:\n${cnt.queryExecution}")
      assert(cnt.collect().head.getLong(0) == 200L)
      // df.count() rides the same plan shape
      assert(spark.read.format("tx").load(root).count() == 200L)
      // and a time-traveled version counts ITS OWN manifest
      val v0 = spark.read.format("tx").option("versionAsOf", "0").load(root)
        .agg(count(lit(1)).as("n"))
      assert(isMetadataAnswered(v0))
      assert(v0.collect().head.getLong(0) == 123L)
    }
  }

  test("gates: filters, count(col), grouping, MoR deletes all degrade to the scan") {
    withRoot { root =>
      TxTable.commit(spark, root,
        spark.range(0, 100L).selectExpr("id",
          "IF(id % 10 = 0, NULL, id % 5) AS g"))
      def t = spark.read.format("tx").load(root)
      // a filter must see rows
      val filtered = t.filter(col("id") >= 50L).agg(count(lit(1)).as("n"))
      assert(!isMetadataAnswered(filtered))
      assert(filtered.collect().head.getLong(0) == 50L)
      // count(col) must see nulls
      val countCol = t.agg(count(col("g")).as("n"))
      assert(!isMetadataAnswered(countCol))
      assert(countCol.collect().head.getLong(0) == 90L)
      // grouped counts must see values
      val grouped = t.groupBy("g").agg(count(lit(1)).as("n"))
      assert(!isMetadataAnswered(grouped))
      assert(grouped.count() == 6L)
      // a MoR delete routes to TxMorRelation — the rule never matches,
      // so the count reflects the DELETED state, not the stale manifest
      TxTable.deleteWhere(spark, root, col("id") < 10L)
      val afterDelete = t.agg(count(lit(1)).as("n"))
      assert(!isMetadataAnswered(afterDelete))
      assert(afterDelete.collect().head.getLong(0) == 90L)
    }
  }

  test("a manifest without rows lines degrades to the scan") {
    withRoot { root =>
      // craft a pre-rows-era manifest by hand: one real parquet file,
      // no `rows` line
      spark.range(0, 42L).toDF("id").coalesce(1)
        .write.parquet(s"$root/data/w-manual")
      val file = Files.list(Paths.get(root, "data", "w-manual"))
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .findFirst().get().getFileName.toString
      Files.createDirectories(Paths.get(root, "_manifests"))
      Files.write(Paths.get(root, "_manifests", "v000000000.txt"),
        java.util.Arrays.asList("graft-txtable-v1",
          s"data/w-manual/$file", "COMMIT"))
      val cnt = spark.read.format("tx").load(root)
        .agg(count(lit(1)).as("n"))
      assert(!isMetadataAnswered(cnt))
      assert(cnt.collect().head.getLong(0) == 42L)
    }
  }
}
