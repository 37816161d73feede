package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, DataSourceV2Relation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxTable

/** `format("txv2")` — the DSv2 spike (r18 verdict task 7): the v1
  * connector's q201/q203/q208 shapes re-driven through a
  * TableProvider whose scan is Spark's own vectorized ParquetScan plus
  * SupportsRuntimeFiltering. The claims: (1) reads are exactly the v1
  * answers, (2) pushed filters reach the SAME manifest index (stat +
  * bloom pruning observable through `lastPruned`), (3) DPP works with
  * NO TxMorDppRouting surrogate and no GraftExtensions — the
  * PartitionPruning rule targets the scan directly and the runtime
  * re-plan drops partitions through the manifest.
  */
class TxV2Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def withRoot(f: String => Unit): Unit = {
    val tmp = Files.createTempDirectory("graft_txv2_")
    try f(s"$tmp/t") finally graft.streaming.Replay.deleteRecursively(tmp)
  }

  private def v2Table(df: DataFrame): graft.sources.TxV2Table =
    df.queryExecution.analyzed.collectFirst {
      case r: DataSourceV2Relation => r.table
    }.get.asInstanceOf[graft.sources.TxV2Table]

  private def batchScan(df: DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail(
      s"no BatchScanExec — not the v2 path:\n${df.queryExecution}"))

  test("q201 shape: clean read equality, range-stat pruning through " +
      "the pushed filters, time travel") {
    withRoot { root =>
      TxTable.commit(spark, root,
        spark.range(0, 1000L).selectExpr("id AS k", "id % 7 AS v"),
        clusterBy = Some("k"))
      TxTable.commit(spark, root,
        spark.range(1000L, 1500L).selectExpr("id AS k", "id % 7 AS v"),
        TxTable.Append, clusterBy = Some("k"))
      val rel = spark.read.format("txv2").load(root)
      assert(batchScan(rel).toString.contains("GraftTxV2"))
      // content equality with the v1 path
      assert(rel.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        spark.read.format("tx").load(root).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet)
      // pushed range filter prunes at the manifest
      val t = v2Table(rel)
      val total = TxTable.currentSnapshot(root).get.files.size
      val q = rel.filter(col("k") >= 100L && col("k") <= 120L)
      assert(q.collect().map(_.getLong(0)).toSet == (100L to 120L).toSet)
      val pruned = t.index.lastPruned.get
      assert(pruned.nonEmpty && pruned.size < total,
        s"stat pruning did not bite: ${pruned.size}/$total")
      // time travel
      val v0 = spark.read.format("txv2").option("versionAsOf", "0")
        .load(root)
      assert(v0.count() == 1000L)
    }
  }

  test("q203 shape: bloom IN-probe pruning through the v2 pushdown") {
    withRoot { root =>
      // scattered column: stats can't prune, blooms can
      TxTable.commit(spark, root,
        spark.range(0, 2000L)
          .selectExpr("id AS k", "pmod(hash(id), 1000) AS h")
          .repartition(8, col("k")),
        bloomCols = Seq("h"))
      val rel = spark.read.format("txv2").load(root)
      val t = v2Table(rel)
      val total = TxTable.currentSnapshot(root).get.files.size
      val probe = rel.filter(col("h").isInCollection(Seq(17L)))
      val viaV2 = probe.collect().map(_.getLong(0)).toSet
      val viaV1 = spark.read.format("tx").load(root)
        .filter(col("h").isInCollection(Seq(17L)))
        .collect().map(_.getLong(0)).toSet
      assert(viaV2 == viaV1)
      val pruned = t.index.lastPruned.get
      assert(pruned.size < total,
        s"bloom pruning did not bite: ${pruned.size}/$total")
    }
  }

  test("q208 shape: DPP through SupportsRuntimeFiltering — no " +
      "surrogate, no GraftExtensions rule, partitions drop at runtime") {
    val tmp = Files.createTempDirectory("graft_txv2dpp_")
    try {
      val factRoot = s"$tmp/fact"
      val dimRoot = s"$tmp/dim"
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      import ss.implicits._
      TxTable.commit(ss, factRoot,
        graft.Tables.documents(ss, "/root/testdata/sf0.001")
          .select("doc_id", "lang", "source", "n_chars")
          .repartitionByRange(8, col("lang"), col("n_chars")),
        TxTable.Overwrite, partitionBy = Some("lang"))
      TxTable.commit(ss, dimRoot,
        Seq(("de", "eu"), ("en", "eu"), ("fr", "eu"),
          ("es", "amer"), ("zh", "asia")).toDF("lang", "region"))
      val fact = ss.read.format("txv2")
        .option("partitionedRead", "true").load(factRoot)
      val dim = ss.read.format("tx").load(dimRoot)
        .filter(col("region").isInCollection(Seq("amer", "asia")))
      val out = fact.join(dim, "lang")
        .groupBy("lang").agg(count(lit(1)).as("n"),
          sum("n_chars").cast("long").as("c"))
        .orderBy("lang")
      val rows = out.collect()
      // oracle: the plain filter answer
      val expect = graft.Tables.documents(ss, "/root/testdata/sf0.001")
        .filter(col("lang").isInCollection(Seq("es", "zh")))
        .groupBy("lang").agg(count(lit(1)).as("n"),
          sum("n_chars").cast("long").as("c"))
        .orderBy("lang").collect()
      assert(rows.map(_.toString).toSeq == expect.map(_.toString).toSeq)
      // the scan carries a runtime (dynamic pruning) filter
      val scan = out.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case b: BatchScanExec
          if b.toString.contains("GraftTxV2") => b }
        .getOrElse(fail("no v2 fact scan in the plan"))
      assert(scan.runtimeFilters.nonEmpty,
        s"no runtime filter on the v2 scan:\n$scan")
      // and the runtime re-plan pruned partitions through the manifest:
      // lastPruned reflects the LAST listFiles — the filtered one
      val t = v2Table(fact)
      val total = TxTable.currentSnapshot(factRoot).get.files.size
      val kept = t.index.lastPruned.get
      assert(kept.nonEmpty && kept.size < total,
        s"runtime filtering dropped nothing (${kept.size}/$total)")
    } finally graft.streaming.Replay.deleteRecursively(tmp)
  }

  test("refusals: MoR and column-mapped snapshots route to format(tx)") {
    withRoot { root =>
      import spark.implicits._
      TxTable.commit(spark, root,
        Seq((1L, "a"), (2L, "b")).toDF("k", "s"))
      TxTable.deleteWhere(spark, root, col("k") === 1L)
      val e = intercept[Exception](
        spark.read.format("txv2").load(root).collect())
      assert(e.getMessage.contains("CLEAN snapshots only"))
      TxTable.purgeDeletes(spark, root)
      assert(spark.read.format("txv2").load(root).count() == 1L)
      TxTable.renameColumn(spark, root, "s", "t")
      val e2 = intercept[Exception](
        spark.read.format("txv2").load(root).collect())
      assert(e2.getMessage.contains("CLEAN snapshots only"))
    }
  }
}
