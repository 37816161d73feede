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
  * appends must match the layout exactly; rewrites that re-shuffle
  * through the identical hash (optimize/compactSmall/purge since r17,
  * MERGE and CoW DELETE since r18, MoR UPDATE's image appends since
  * r19) carry the declaration, and only rewrites whose files provably
  * hold a DIFFERENT order (zorder, dpo) drop it (reads degrade to
  * plain scans, never lie).
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

  /** Pins the co-location claim on `root`'s current snapshot: a join of
    * two independent tx reads on the bucket column plans with NO
    * exchange under the join (multi-file buckets may still sort — Spark
    * withholds only the ordering, never the partitioning).
    */
  private def assertZeroExchangeJoin(root: String): Unit = {
    val ss = smjSession()
    val plan = ss.read.format("tx").load(root)
      .join(ss.read.format("tx").load(root), "k")
      .queryExecution.executedPlan
    val smj = plan.collectFirst { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, s"expected a sort-merge join:\n$plan")
    assert(smj.get.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"bucketed join still shuffles:\n$plan")
  }

  test("streaming sink lands micro-batches IN the bucket layout; mismatch refuses on batch 0") {
    withRoot { root =>
      TxTable.commit(spark, root, df(spark, 100), TxTable.Overwrite,
        bucketBy = Some(("k", 4)))
      val sink = new graft.sources.TxSink(root, appId = "bucketsink",
        partitionCols = Nil, statsCols = Nil, bloomCols = Nil,
        bucketBy = Some((Seq("k"), 4)))
      sink.addBatch(0L, df(spark, 150, seed = 7L))
      sink.addBatch(1L, df(spark, 180, seed = 9L))
      sink.addBatch(0L, df(spark, 150, seed = 7L)) // replay no-ops
      val snap = TxTable.currentSnapshot(root).get
      assert(snap.version == 2L && snap.bucketSpec.contains((4, Seq("k"))))
      assert(TxTable.read(spark, root).count() == 430L)
      // a sink whose declared layout disagrees refuses the FIRST batch
      val bad = new graft.sources.TxSink(root, appId = "badsink",
        partitionCols = Nil, statsCols = Nil, bloomCols = Nil,
        bucketBy = Some((Seq("k"), 8)))
      intercept[IllegalArgumentException](
        bad.addBatch(0L, df(spark, 10, seed = 3L)))
      // and an UNDECLARED sink cannot corrupt the co-location either
      val plain = new graft.sources.TxSink(root, appId = "plainsink",
        partitionCols = Nil, statsCols = Nil, bloomCols = Nil)
      intercept[IllegalArgumentException](
        plain.addBatch(0L, df(spark, 10, seed = 3L)))
    }
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
      // MoR delete moves no row and purge re-buckets through the same
      // hash — BOTH preserve the declaration (r17)
      TxTable.deleteWhere(spark, root, col("k") === 7L)
      assert(TxTable.currentSnapshot(root).get.bucketSpec
        .contains((4, Seq("k"))), "a MoR delete moves no row: layout holds")
      TxTable.purgeDeletes(spark, root)
      assert(TxTable.currentSnapshot(root).get.bucketSpec
        .contains((4, Seq("k"))), "purge re-buckets its rewrite: holds")
      assert(TxTable.currentSnapshot(root).get.dvs.isEmpty)
      assert(spark.read.format("tx").load(root).count() == 399L)
      // a CoW MERGE re-buckets its rewrite through the same
      // pmod(murmur3) — the most common DML verb PRESERVES the
      // declaration (r18; r17 used this exact call as the drop-demo)
      import spark.implicits._
      TxTable.mergeByKey(spark, root,
        Seq((3L, 777L), (9999L, 1L)).toDF("k", "v"), Seq("k"))
      val postMerge = TxTable.currentSnapshot(root).get
      assert(postMerge.bucketSpec.contains((4, Seq("k"))),
        "a CoW merge re-buckets through the identical hash — it must " +
          "carry the declaration")
      val merged = spark.read.format("tx").load(root)
      assert(merged.count() == 400L) // 399 + 1 insert
      assert(merged.filter(col("k") === 3L).select("v")
        .collect().map(_.getLong(0)).toSeq == Seq(777L))
      // pruned CoW merge, additive merge and CoW deleteRange keep it too
      TxTable.mergeByKeyPruned(spark, root,
        Seq((5L, 555L)).toDF("k", "v"), "k")
      assert(TxTable.currentSnapshot(root).get.bucketSpec
        .contains((4, Seq("k"))), "pruned merge must carry the layout")
      TxTable.mergeAdditive(spark, root,
        Seq((5L, 10L)).toDF("k", "v"), "k")
      assert(TxTable.currentSnapshot(root).get.bucketSpec
        .contains((4, Seq("k"))), "additive merge must carry the layout")
      assert(spark.read.format("tx").load(root)
        .filter(col("k") === 5L).select("v")
        .collect().map(_.getLong(0)).toSeq == Seq(565L))
      TxTable.deleteRange(spark, root, "k", 9999.0, 9999.0)
      assert(TxTable.currentSnapshot(root).get.bucketSpec
        .contains((4, Seq("k"))), "CoW delete must carry the layout")
      assert(spark.read.format("tx").load(root).count() == 399L)
      // MoR UPDATE re-lands its post-image files through the SAME
      // pmod(murmur3) writer (r19) — the last common DML verb now
      // CARRIES the declaration; after purge materializes the DVs the
      // join is exchange-free again with zero manual re-bucketing
      TxTable.updateWhere(spark, root, col("k") === 5L,
        Seq("v" -> lit(556L)))
      val postUpdate = TxTable.currentSnapshot(root).get
      assert(postUpdate.bucketSpec.contains((4, Seq("k"))),
        "a MoR update re-buckets its images — it must carry the layout")
      assert(spark.read.format("tx").load(root).count() == 399L)
      assert(spark.read.format("tx").load(root)
        .filter(col("k") === 5L).select("v")
        .collect().map(_.getLong(0)).toSeq == Seq(556L))
      TxTable.purgeDeletes(spark, root)
      val purged = TxTable.currentSnapshot(root).get
      assert(purged.bucketSpec.contains((4, Seq("k"))) &&
        purged.dvs.isEmpty,
        "purge after update: clean bucketed snapshot, layout intact")
      assertZeroExchangeJoin(root)
      // the remaining LEGITIMATE drop case: a Z-order rewrite
      // re-clusters every row by Morton order — its files provably do
      // NOT hold the hash layout, so the declaration must go
      TxTable.commitZOrdered(spark, root,
        spark.read.format("tx").load(root), "k", "v", targetFiles = 4)
      assert(TxTable.currentSnapshot(root).get.bucketSpec.isEmpty,
        "a Z-order rewrite re-clusters rows — it must drop the layout")
      assert(spark.read.format("tx").load(root).count() == 399L)
      // and the now-unbucketed table refuses a bucketed append (mixed
      // layout would resurrect a stale promise)
      val e3 = intercept[IllegalArgumentException](
        TxTable.commit(spark, root, df(spark, 10), TxTable.Append,
          bucketBy = Some(("k", 4))))
      assert(e3.getMessage.contains("layout"))
    }
  }

  test("merge keeps the co-located join exchange-free, exact content") {
    withRoot { root =>
      import spark.implicits._
      val ss = smjSession()
      val rootB = s"$root-b"
      TxTable.commit(ss, root, df(ss, 400), TxTable.Overwrite,
        bucketBy = Some(("k", 4)))
      TxTable.commit(ss, rootB, df(ss, 300, seed = 9), TxTable.Overwrite,
        bucketBy = Some(("k", 4)))
      val before = ss.read.format("tx").load(root)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      TxTable.mergeByKey(ss, root,
        Seq((7L, 700L), (4000L, 1L)).toDF("k", "v"), Seq("k"))
      val joined = ss.read.format("tx").load(root)
        .join(ss.read.format("tx").load(rootB), "k")
      val smj = joined.queryExecution.executedPlan
        .collectFirst { case j: SortMergeJoinExec => j }.get
      assert(smj.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        "post-merge bucketed join should plan zero exchanges")
      // content: merge semantics applied, nothing else moved
      val after = ss.read.format("tx").load(root)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(after == before.updated(7L, 700L).updated(4000L, 1L))
      // a full-rewrite merge lands ONE sorted file per bucket — the
      // zero-sort economics hold too (legacy ordering knob session)
      assert(TxTable.currentSnapshot(root).get.files.size == 4)
      assert(smj.collect {
        case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
        "full-rewrite merge should restore one-sorted-file-per-bucket")
    }
  }

  test("optimize PRESERVES the bucket layout and restores zero-sort joins after appends") {
    withRoot { root =>
      val ss = smjSession()
      val rootB = s"$root-b"
      TxTable.commit(ss, root, df(ss, 600), TxTable.Overwrite,
        bucketBy = Some(("k", 4)))
      // two appends: buckets go multi-file — joins stay exchange-free
      // but Spark withholds the in-bucket sort order, so sorts return
      TxTable.commit(ss, root,
        ss.range(600, 700).selectExpr("id AS k", "id % 7 AS v"),
        TxTable.Append, bucketBy = Some(("k", 4)))
      TxTable.commit(ss, root,
        ss.range(700, 800).selectExpr("id AS k", "id % 7 AS v"),
        TxTable.Append, bucketBy = Some(("k", 4)))
      TxTable.commit(ss, rootB, df(ss, 500, seed = 9), TxTable.Overwrite,
        bucketBy = Some(("k", 4)))
      def joined() = ss.read.format("tx").load(root)
        .join(ss.read.format("tx").load(rootB), "k")
      val before = joined()
      val smjB = before.queryExecution.executedPlan
        .collectFirst { case j: SortMergeJoinExec => j }.get
      assert(smjB.collect { case e: ShuffleExchangeExec => e }.isEmpty)
      assert(smjB.collect {
        case s: org.apache.spark.sql.execution.SortExec => s }.nonEmpty,
        "multi-file buckets should have forced sorts back in")
      // the compaction: layout declared AND one sorted file per bucket
      TxTable.optimize(ss, root, targetFiles = 1)
      val snap = TxTable.currentSnapshot(root).get
      assert(snap.bucketSpec.contains((4, Seq("k"))),
        "optimize dropped the bucket layout")
      assert(snap.files.size == 4, s"expected 1 file/bucket: ${snap.files}")
      val after = joined()
      val smjA = after.queryExecution.executedPlan
        .collectFirst { case j: SortMergeJoinExec => j }.get
      assert(smjA.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        "optimize broke the co-located join")
      assert(smjA.collect {
        case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
        "optimize did not restore the one-sorted-file-per-bucket economics")
      // content identical through the whole lifecycle
      assert(after.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
        before.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
      assert(after.count() == 500L)
      // optimize doubles as purge on bucketed tables: a MoR delete then
      // optimize clears the DVs without losing the layout
      TxTable.deleteWhere(ss, root, col("k") === 3L)
      TxTable.optimize(ss, root, targetFiles = 1)
      assert(TxTable.currentSnapshot(root).get.bucketSpec
        .contains((4, Seq("k"))))
      assert(TxTable.currentSnapshot(root).get.dvs.isEmpty)
      assert(ss.read.format("tx").load(root).count() == 799L)
      // clusterBy on a bucketed table refuses: layout is bucket-owned
      val e = intercept[IllegalArgumentException](
        TxTable.optimize(ss, root, 2, clusterBy = Seq("v")))
      assert(e.getMessage.contains("bucket-owned"))
    }
  }

  test("compactSmall preserves the bucket grid (O(tail) co-location-keeping policy)") {
    withRoot { root =>
      val ss = smjSession()
      val rootB = s"$root-b"
      TxTable.commit(ss, root, df(ss, 800), TxTable.Overwrite,
        bucketBy = Some(("k", 4)))
      TxTable.commit(ss, root,
        ss.range(800, 820).selectExpr("id AS k", "id % 7 AS v"),
        TxTable.Append, bucketBy = Some(("k", 4)))
      TxTable.commit(ss, rootB, df(ss, 300, seed = 2), TxTable.Overwrite,
        bucketBy = Some(("k", 4)))
      val beforeFiles = TxTable.currentSnapshot(root).get.files.size
      // the tiny append files compact; the healthy base files stay put
      TxTable.compactSmall(ss, root, minBytes = 3000L)
      val snap = TxTable.currentSnapshot(root).get
      assert(snap.bucketSpec.contains((4, Seq("k"))),
        "compactSmall dropped the bucket layout")
      assert(snap.files.size < beforeFiles)
      val joined = ss.read.format("tx").load(root)
        .join(ss.read.format("tx").load(rootB), "k")
      val smj = joined.queryExecution.executedPlan
        .collectFirst { case j: SortMergeJoinExec => j }.get
      assert(smj.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        "compaction broke the co-located join")
      assert(joined.count() == 300L)
    }
  }

  test("multi-column bucketBy: zero-exchange join on the compound key") {
    withRoot { root =>
      val ss = smjSession()
      val rootB = s"$root-b"
      def pairs(n: Int, seed: Long) = ss.range(0, n.toLong)
        .selectExpr("id % 50 AS k1", s"id % 7 AS k2",
          s"(id * 31 + $seed) % 100 AS v")
      TxTable.commit(ss, root, pairs(400, 0), TxTable.Overwrite,
        bucketByMulti = Some((Seq("k1", "k2"), 8)))
      TxTable.commit(ss, rootB, pairs(350, 4), TxTable.Overwrite,
        bucketByMulti = Some((Seq("k1", "k2"), 8)))
      assert(TxTable.currentSnapshot(root).get.bucketSpec
        .contains((8, Seq("k1", "k2"))))
      val joined = ss.read.format("tx").load(root)
        .join(ss.read.format("tx").load(rootB), Seq("k1", "k2"))
      val smj = joined.queryExecution.executedPlan
        .collectFirst { case j: SortMergeJoinExec => j }.get
      assert(smj.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"compound-key bucketed join still shuffles:\n" +
          joined.queryExecution)
      // correctness pin: identical to the plain join (a hash computed
      // over the wrong column order would silently drop matches)
      val got = joined.groupBy().agg(count(lit(1))).collect()(0).getLong(0)
      val want = pairs(400, 0).join(pairs(350, 4), Seq("k1", "k2")).count()
      assert(got == want && got > 0)
      // appends must match the full compound spec
      val e = intercept[IllegalArgumentException](
        TxTable.commit(ss, root, pairs(10, 0), TxTable.Append,
          bucketByMulti = Some((Seq("k2", "k1"), 8))))
      assert(e.getMessage.contains("layout"))
    }
  }

  test("partition x bucket grid: pruning on one axis, exchange-free join on the other") {
    withRoot { root =>
      val ss = smjSession()
      val rootB = s"$root-b"
      val part = ss.range(0, 900).selectExpr("id AS k",
        "CASE WHEN id % 3 = 0 THEN 'de' WHEN id % 3 = 1 THEN 'en' " +
          "ELSE 'zh' END AS lang", "id % 11 AS v")
      TxTable.commit(ss, root, part, TxTable.Overwrite,
        partitionBy = Some("lang"), bucketBy = Some(("k", 4)))
      TxTable.commit(ss, rootB, df(ss, 600, seed = 8), TxTable.Overwrite,
        bucketBy = Some(("k", 4)))
      val snap = TxTable.currentSnapshot(root).get
      assert(snap.bucketSpec.contains((4, Seq("k"))))
      // every file carries BOTH a part line and a bucket-id name
      val re = ".*_(\\d+)\\.parquet$".r
      snap.files.foreach { f =>
        assert(snap.parts.getOrElse(f, Seq.empty).exists(_._1 == "lang"),
          s"$f missing part line")
        assert(re.findFirstIn(f).nonEmpty, s"$f missing bucket id")
      }
      // partition axis: a lang filter prunes whole directories (through
      // the surfaced posture it is a real partitionFilter)
      // (count() alone would now answer from metadata with ZERO scans —
      // the r17 filtered TxMetadataAgg — so probe with a sum, which must
      // read rows and therefore exercises the partition-filter prune)
      val surf = ss.read.format("tx").option("partitionedRead", "true")
        .load(root).filter(col("lang") === "en")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      assert(surf.collect().head.getLong(0) == 300L)
      val idx = surf.queryExecution.sparkPlan.collectLeaves().collectFirst {
        case f: FileSourceScanExec
            if f.relation.location.isInstanceOf[graft.sources.TxFileIndex] =>
          f.relation.location.asInstanceOf[graft.sources.TxFileIndex]
      }.get
      assert(idx.lastPruned.get.size < snap.files.size,
        "partition filter pruned nothing")
      // bucket axis: the fact-fact join plans zero exchanges — bucket
      // files group by id ACROSS partition directories
      val joined = ss.read.format("tx").load(root)
        .join(ss.read.format("tx").load(rootB), "k")
      val smj = joined.queryExecution.executedPlan
        .collectFirst { case j: SortMergeJoinExec => j }.get
      assert(smj.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"partitioned+bucketed join still shuffles:\n" +
          joined.queryExecution)
      assert(joined.count() == 600L)
      // the grid survives optimize: both axes re-land
      TxTable.commit(ss, root, ss.range(900, 950).selectExpr("id AS k",
        "'en' AS lang", "id % 11 AS v"), TxTable.Append,
        partitionBy = Some("lang"), bucketBy = Some(("k", 4)))
      TxTable.optimize(ss, root, targetFiles = 1)
      val snap2 = TxTable.currentSnapshot(root).get
      assert(snap2.bucketSpec.contains((4, Seq("k"))))
      assert(snap2.files.forall(f =>
        snap2.parts.getOrElse(f, Seq.empty).exists(_._1 == "lang")))
      val surf2 = ss.read.format("tx").option("partitionedRead", "true")
        .load(root)
      assert(surf2.count() == 950L)
      val joined2 = ss.read.format("tx").load(root)
        .join(ss.read.format("tx").load(rootB), "k")
      assert(joined2.queryExecution.executedPlan
        .collectFirst { case j: SortMergeJoinExec => j }.get
        .collect { case e: ShuffleExchangeExec => e }.isEmpty)
      assert(joined2.count() == 600L)
      // bucketing a partition column refuses (one value per partition)
      val e = intercept[IllegalArgumentException](
        TxTable.commit(ss, s"$root-x", part, TxTable.Overwrite,
          partitionBy = Some("lang"), bucketBy = Some(("lang", 4))))
      assert(e.getMessage.contains("overlap"))
    }
  }

  test("metadata-only ops carry the layout; dropping a bucket column refuses") {
    withRoot { root =>
      TxTable.commit(spark, root, df(spark, 200), TxTable.Overwrite,
        bucketBy = Some(("k", 4)))
      TxTable.addCheck(spark, root, "v_bounds", "v >= 0")
      assert(TxTable.currentSnapshot(root).get.bucketSpec
        .contains((4, Seq("k"))), "add_check dropped the layout")
      // renaming the bucket column: the declaration follows the name
      // (the hash was computed on values, names are logical)
      TxTable.renameColumn(spark, root, "k", "key")
      assert(TxTable.currentSnapshot(root).get.bucketSpec
        .contains((4, Seq("key"))), "rename lost the layout")
      // dropping a bucket column refuses — the declaration would
      // reference a dead column
      val e = intercept[IllegalArgumentException](
        TxTable.dropColumn(spark, root, "key"))
      assert(e.getMessage.contains("bucket column"))
      // RESTORE carries the target version's layout
      TxTable.restore(spark, root, 0L)
      assert(TxTable.currentSnapshot(root).get.bucketSpec
        .contains((4, Seq("k"))), "restore lost the target's layout")
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
