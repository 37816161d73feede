package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxTable

/** Hash-bucketed TxTables: `commit(bucketBy = (col, n))` writes one
  * shuffle of `HashPartitioning(col, n)` with files named in Spark's
  * bucketed convention, the manifest declares the layout (format 6),
  * and the `format("tx")` relation surfaces it as a real `BucketSpec`
  * — joins and aggregations on the bucket column plan WITHOUT an
  * exchange. The commit protocol owns the co-location contract:
  * appends must match the layout exactly, rewrites drop the
  * declaration (reads degrade to plain scans, never lie).
  */
class TxBucketSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def withRoot(f: String => Unit): Unit = {
    val tmp = Files.createTempDirectory("graft_txbucket_")
    try f(s"$tmp/t") finally graft.streaming.Replay.deleteRecursively(tmp)
  }

  private def df(s: SparkSession, n: Int, seed: Long = 0L): DataFrame =
    s.range(0, n.toLong).selectExpr("id AS k",
      s"(id * 37 + $seed) % 1000 AS v")

  /** An AQE-off session where neither join side auto-broadcasts, so the
    * join strategy is sort-merge and the exchange question is decided
    * purely by the scans' reported partitioning.
    */
  private def smjSession(): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.adaptive.enabled", "false")
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    // report the committer's in-bucket sort order from the scan — Spark
    // only claims it under this knob, and only for one-file buckets
    // (multi-file buckets fall back to sorting, guarded by Spark itself)
    ss.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    ss
  }

  test("bucketed commit: exact round-trip, bucket-id file names, format-6 manifest") {
    withRoot { root =>
      TxTable.commit(spark, root, df(spark, 500), TxTable.Overwrite,
        bucketBy = Some(("k", 4)))
      val snap = TxTable.currentSnapshot(root).get
      assert(snap.bucketSpec.contains((4, Seq("k"))))
      // every data file carries a parseable bucket id < n
      val re = ".*_(\\d+)\\.parquet$".r
      val ids = snap.files.map {
        case re(i) => i.toInt
        case f => fail(s"file $f has no bucket id suffix")
      }
      assert(ids.forall(i => i >= 0 && i < 4) && ids.distinct.size > 1)
      val manifest = new String(Files.readAllBytes(
        java.nio.file.Paths.get(root, "_manifests", "v000000000.txt")))
      assert(manifest.contains("format 6") &&
        manifest.contains("bucketspec 4"))
      // the connector reads it back exactly
      val back = spark.read.format("tx").load(root)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(back == df(spark, 500)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    }
  }

  test("bucketed join on the bucket column plans with ZERO exchanges, exact rows") {
    withRoot { root =>
      val ss = smjSession()
      val rootB = s"$root-b"
      TxTable.commit(ss, root, df(ss, 1000), TxTable.Overwrite,
        bucketBy = Some(("k", 8)))
      TxTable.commit(ss, rootB, df(ss, 700, seed = 5), TxTable.Overwrite,
        bucketBy = Some(("k", 8)))
      val a = ss.read.format("tx").load(root)
      val b = ss.read.format("tx").load(rootB)
      val joined = a.join(b, "k")
      val plan = joined.queryExecution.executedPlan
      val smj = plan.collectFirst { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, s"expected a sort-merge join:\n$plan")
      // THE claim: co-located scans — no exchange anywhere under the join
      assert(smj.get.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"bucketed join still shuffles:\n$plan")
      // and, single-file buckets being sorted within by the committer's
      // invariant, the merge join needs no sorts either
      assert(smj.get.collect {
        case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
        s"bucketed join still sorts:\n$plan")
      // correctness pin for the bucket-id ↔ hash agreement: if file
      // bucket ids disagreed with pmod(murmur3(k), 8), the exchange-free
      // join would MISS matching rows — compare against the plain join
      val viaBuckets = joined.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val oracle = df(ss, 1000).join(df(ss, 700, seed = 5), "k").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(viaBuckets == oracle && viaBuckets.size == 700)
      // and a groupBy on the bucket column aggregates without exchange
      val agg = a.groupBy("k").agg(sum("v").as("sv"))
      assert(agg.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeExec => e }.isEmpty,
        "bucketed groupBy still shuffles")
      assert(agg.count() == 1000L)
    }
  }

  test("bucket pruning: an equality probe scans a single bucket") {
    withRoot { root =>
      val ss = smjSession()
      // scan-only queries have no distribution requirement, so the
      // DisableUnnecessaryBucketedScan rule would turn the bucketed
      // scan (and with it, pruning) off — pin it on, Spark's own knob
      ss.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        "false")
      TxTable.commit(ss, root, df(ss, 1000), TxTable.Overwrite,
        bucketBy = Some(("k", 8)))
      val probe = ss.read.format("tx").load(root).filter(col("k") === 123L)
      val scan = probe.queryExecution.executedPlan.collectLeaves()
        .collectFirst { case f: FileSourceScanExec => f }.get
      assert(scan.toString.contains("SelectedBucketsCount: 1 out of 8"),
        s"no bucket pruning in:\n$scan")
      assert(probe.collect().map(_.getLong(0)).toSeq == Seq(123L))
    }
  }

  test("appends must match the layout; rewrites drop the declaration safely") {
    withRoot { root =>
      TxTable.commit(spark, root, df(spark, 300), TxTable.Overwrite,
        bucketBy = Some(("k", 4)))
      // matching append: layout carried, combined read exact
      TxTable.commit(spark, root,
        spark.range(300, 400).selectExpr("id AS k", "id % 7 AS v"),
        TxTable.Append, bucketBy = Some(("k", 4)))
      assert(TxTable.currentSnapshot(root).get.bucketSpec
        .contains((4, Seq("k"))))
      assert(spark.read.format("tx").load(root).count() == 400L)
      // unbucketed append: refused loudly
      val e1 = intercept[IllegalArgumentException](
        TxTable.commit(spark, root, df(spark, 10), TxTable.Append))
      assert(e1.getMessage.contains("co-location"))
      // differently-bucketed append: refused loudly
      val e2 = intercept[IllegalArgumentException](
        TxTable.commit(spark, root, df(spark, 10), TxTable.Append,
          bucketBy = Some(("k", 8))))
      assert(e2.getMessage.contains("layout"))
      // a rewrite (optimize) DROPS the declaration — reads degrade to a
      // plain scan of the rewritten files, still exact
      TxTable.optimize(spark, root, targetFiles = 2)
      assert(TxTable.currentSnapshot(root).get.bucketSpec.isEmpty)
      assert(spark.read.format("tx").load(root).count() == 400L)
      // and the now-unbucketed table refuses a bucketed append (mixed
      // layout would resurrect a stale promise)
      val e3 = intercept[IllegalArgumentException](
        TxTable.commit(spark, root, df(spark, 10), TxTable.Append,
          bucketBy = Some(("k", 4))))
      assert(e3.getMessage.contains("layout"))
    }
  }

  test("mismatched bucket counts still join shuffle-free via Spark's bucket coalescing") {
    withRoot { root =>
      val ss = smjSession()
      ss.conf.set("spark.sql.bucketing.coalesceBucketsInJoin.enabled",
        "true")
      val rootB = s"$root-b"
      TxTable.commit(ss, root, df(ss, 600), TxTable.Overwrite,
        bucketBy = Some(("k", 8)))
      TxTable.commit(ss, rootB, df(ss, 400, seed = 3), TxTable.Overwrite,
        bucketBy = Some(("k", 4)))
      val joined = ss.read.format("tx").load(root)
        .join(ss.read.format("tx").load(rootB), "k")
      val smj = joined.queryExecution.executedPlan
        .collectFirst { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty)
      assert(smj.get.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"coalesced bucket join still shuffles:\n${joined.queryExecution}")
      assert(joined.count() == 400L)
    }
  }

  test("writer options bucketBy/bucketCount flow through save and INSERT INTO") {
    withRoot { root =>
      df(spark, 200).write.format("tx").mode("overwrite")
        .option("bucketBy", "k").option("bucketCount", "4").save(root)
      assert(TxTable.currentSnapshot(root).get.bucketSpec
        .contains((4, Seq("k"))))
      spark.read.format("tx")
        .option("bucketBy", "k").option("bucketCount", "4").load(root)
        .createOrReplaceTempView("bview")
      spark.sql("INSERT INTO bview SELECT id AS k, id % 3 AS v " +
        "FROM range(200, 250)")
      val snap = TxTable.currentSnapshot(root).get
      assert(snap.bucketSpec.contains((4, Seq("k"))))
      assert(spark.read.format("tx").load(root).count() == 250L)
      spark.catalog.dropTempView("bview")
    }
  }
}
