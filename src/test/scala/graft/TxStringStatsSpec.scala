package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxTable

/** Format-9 STRING min/max file statistics: `commit(statsCols)` routes
  * string columns to `sstat` lines (base64 of UTF-8 byte bounds,
  * truncated at [[TxTable.StrStatCap]] bytes with the Delta/Iceberg
  * successor rule on the max), `TxFileIndex` prunes string
  * equality/range/prefix predicates on them, and
  * [[graft.plans.TxMetadataAgg]] answers string MIN/MAX zero-scan on
  * UNpartitioned tables when every bound is exact. The soundness rules
  * under test: a truncated min is a strict LOWER bound, a truncated max
  * a strict UPPER bound, exactness gates every metadata answer, and
  * comparisons happen in unsigned byte order (= UTF8String binary
  * order), never UTF-16 code-unit order.
  */
class TxStringStatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def withRoot(f: String => Unit): Unit = {
    val tmp = Files.createTempDirectory("graft_txsstat_")
    try f(s"$tmp/t") finally graft.streaming.Replay.deleteRecursively(tmp)
  }

  private def isMetadataAnswered(df: DataFrame): Boolean = {
    val opt = df.queryExecution.optimizedPlan
    opt.collect { case lr: LogicalRelation => lr }.isEmpty &&
      opt.collect { case l: LocalRelation => l }.nonEmpty
  }

  private def bytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  // ---- truncation helpers: the byte-level soundness core -------------

  test("truncMin: boundary lengths, prefix is a strict lower bound") {
    val at = "x" * TxTable.StrStatCap
    val (mnAt, exAt) = TxTable.truncMin(bytes(at))
    assert(exAt && (mnAt sameElements bytes(at)))
    val over = at + "y"
    val (mn, exact) = TxTable.truncMin(bytes(over))
    assert(!exact && (mn sameElements bytes(at)))
    assert(TxTable.ucmp(mn, bytes(over)) < 0, "prefix < full in byte order")
  }

  test("truncMaxBound: successor bump is a strict upper bound; " +
      "multi-byte chars may be cut mid-codepoint and stay sound") {
    val over = ("a" * (TxTable.StrStatCap - 1)) + "ézz" // é = 2 bytes
    val (mxOpt, exact) = TxTable.truncMaxBound(bytes(over))
    assert(!exact && mxOpt.isDefined)
    assert(TxTable.ucmp(mxOpt.get, bytes(over)) > 0,
      "bumped prefix must exceed the full value")
    assert(mxOpt.get.length <= TxTable.StrStatCap)
    // exact when it fits
    val fits = "a" * TxTable.StrStatCap
    assert(TxTable.truncMaxBound(bytes(fits))._2)
    // all-0xFF prefix: no successor exists — no upper bound recorded
    val ff = Array.fill[Byte](TxTable.StrStatCap + 1)(0xFF.toByte)
    assert(TxTable.truncMaxBound(ff) == ((None, false)))
    // trailing 0xFF bytes are dropped, the last non-0xFF byte bumps
    val tail = bytes("ab") ++ Array.fill[Byte](TxTable.StrStatCap)(0xFF.toByte)
    val (b, _) = TxTable.truncMaxBound(tail)
    assert(b.get sameElements bytes("ac"))
  }

  // ---- commit + manifest + pruning ------------------------------------

  /** 40 rows in exactly 4 files, one lang value per file: one commit
    * per value (deterministic — a sampled range shuffle could
    * co-locate two values, and AQE coalesces unioned rebalances),
    * each with statsCols on the string column.
    */
  private def langTable(root: String): Unit =
    Seq("de", "en", "fr", "zh").zipWithIndex.foreach { case (l, i) =>
      TxTable.commit(spark, root,
        spark.range(0, 10L).select(col("id"), lit(l).as("lang"))
          .coalesce(1),
        if (i == 0) TxTable.Overwrite else TxTable.Append,
        statsCols = Seq("lang"))
    }

  test("commit(statsCols = string col) records sstat lines, format 9; " +
      "equality/range/prefix predicates prune to the matching files") {
    withRoot { root =>
      langTable(root)
      val manifest = new String(Files.readAllBytes(
        Paths.get(root, "_manifests", "v000000000.txt")))
      assert(manifest.contains("format 9") && manifest.contains("sstat "))
      val snap = TxTable.currentSnapshot(root).get
      assert(snap.files.forall(f => snap.strStats.get(f)
        .exists(_.exists(st => st.col == "lang" && st.exactMin &&
          st.exactMax && st.nulls == 0L))))
      val rel = spark.read.format("tx").load(root)
      val relation = rel.queryExecution.analyzed.collectFirst {
        case org.apache.spark.sql.execution.datasources.LogicalRelation(
          r: graft.sources.TxBatchRelation, _, _, _, _) => r
      }.get
      def prunedFor(d: DataFrame): Seq[String] = {
        d.collect() // plan + execute: listFiles runs
        relation.index.lastPruned.get
      }
      val total = snap.files.size
      // equality: exactly the 'en' file survives
      val en = prunedFor(rel.filter(col("lang") === "en"))
      assert(en.size < total, s"no pruning: $en")
      assert(en.forall(f => snap.strStats(f).exists(st =>
        st.min64 == st.max64)), "only single-value files should survive")
      assert(rel.filter(col("lang") === "en").count() == 10L)
      // range: lang < 'en' keeps only the 'de' file(s)
      val lt = prunedFor(rel.filter(col("lang") < "en"))
      assert(lt.size < total && lt.nonEmpty)
      assert(rel.filter(col("lang") < "en").count() == 10L)
      // prefix: 'z%' keeps only the 'zh' file(s)
      val pre = prunedFor(rel.filter(col("lang").startsWith("z")))
      assert(pre.size < total && pre.nonEmpty)
      assert(rel.filter(col("lang").startsWith("z")).count() == 10L)
      // a value outside every range prunes everything
      assert(prunedFor(rel.filter(col("lang") === "xx")).isEmpty)
    }
  }

  test("truncated bounds stay sound: long values prune conservatively, " +
      "reads exact; IS NULL / IS NOT NULL prune on sstat null counts") {
    withRoot { root =>
      import spark.implicits._
      val longA = "a" * 50 // truncated: bounds bracket, never name it
      val longZ = "z" * 50
      // file 1: long strings + a null; file 2: all-null column
      val d = Seq((1L, longA), (2L, longZ), (3L, null.asInstanceOf[String]))
        .toDF("id", "s").repartition(1)
      TxTable.commit(spark, root, d, statsCols = Seq("s"))
      val dNull = Seq((10L, null.asInstanceOf[String]),
        (11L, null.asInstanceOf[String])).toDF("id", "s").repartition(1)
      TxTable.commit(spark, root, dNull, TxTable.Append,
        statsCols = Seq("s"))
      val snap = TxTable.currentSnapshot(root).get
      val sts = snap.files.flatMap(f => snap.strStats.getOrElse(f, Nil))
      assert(sts.exists(st => !st.exactMin && !st.exactMax),
        "fixture must hold a truncated line")
      assert(sts.exists(_.allNull), "fixture must hold the all-null line")
      val rel = spark.read.format("tx").load(root)
      val relation = rel.queryExecution.analyzed.collectFirst {
        case org.apache.spark.sql.execution.datasources.LogicalRelation(
          r: graft.sources.TxBatchRelation, _, _, _, _) => r
      }.get
      def prunedFor(d: DataFrame): Seq[String] = {
        d.collect(); relation.index.lastPruned.get
      }
      // equality on the long value: the value-bearing file survives the
      // truncated bounds (strict bracketing), the all-null file prunes
      val eq = prunedFor(rel.filter(col("s") === longA))
      assert(eq.size == 1)
      assert(rel.filter(col("s") === longA).count() == 1L)
      // the all-null file answers IS NOT NULL by pruning; the
      // value-bearing file answers nothing for IS NULL (nulls > 0)
      assert(prunedFor(rel.filter(col("s").isNotNull)).size == 1)
      assert(rel.filter(col("s").isNull).count() == 3L)
      // below every truncated lower bound: everything prunes
      assert(prunedFor(rel.filter(col("s") < "a")).isEmpty)
    }
  }

  // ---- metadata MIN/MAX ------------------------------------------------

  test("string MIN/MAX answer zero-scan on an UNpartitioned table; " +
      "binary order beats UTF-16 order on supplementary characters") {
    withRoot { root =>
      import spark.implicits._
      // U+1F600 (4-byte UTF-8, surrogate pair in UTF-16) vs U+FFFD:
      // byte order says emoji is LARGER; String.compareTo says smaller
      val emoji = new String(Character.toChars(0x1F600))
      val d = Seq((1L, "apple"), (2L, "\uFFFD"), (3L, emoji))
        .toDF("id", "s").repartition(1)
      TxTable.commit(spark, root, d, statsCols = Seq("s"))
      assert(emoji.compareTo("\uFFFD") < 0, "UTF-16 order would mis-answer")
      val q = spark.read.format("tx").load(root)
        .agg(min("s").as("mn"), max("s").as("mx"))
      assert(isMetadataAnswered(q), "exact bounds must answer zero-scan")
      val r = q.collect().head
      assert(r.getString(0) == "apple" && r.getString(1) == emoji)
      // append a file whose MIN stays exact but whose MAX truncates:
      // MAX must degrade to the scan (which still answers the emoji —
      // 0xF0 outranks any ASCII byte, however long the string), while
      // MIN keeps its zero-scan answer
      val long = "m" * 50
      TxTable.commit(spark, root,
        Seq((4L, "aa"), (5L, long)).toDF("id", "s").repartition(1),
        TxTable.Append, statsCols = Seq("s"))
      val q2 = spark.read.format("tx").load(root).agg(max("s").as("mx"))
      assert(!isMetadataAnswered(q2),
        "a truncated max brackets without naming — must degrade")
      assert(q2.collect().head.getString(0) == emoji)
      val q3 = spark.read.format("tx").load(root).agg(min("s").as("mn"))
      assert(isMetadataAnswered(q3), "every min bound is exact")
      assert(q3.collect().head.getString(0) == "aa")
    }
  }

  test("all-null column: MIN answers NULL zero-scan; a file without a " +
      "line refuses; rename keeps lookups alias-aware") {
    withRoot { root =>
      import spark.implicits._
      TxTable.commit(spark, root,
        Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
          .toDF("id", "s").repartition(1), statsCols = Seq("s"))
      val q = spark.read.format("tx").load(root).agg(min("s").as("mn"))
      assert(isMetadataAnswered(q))
      assert(q.collect().head.isNullAt(0))
      // rename: sstat lines keep the write-time name, consumers map
      TxTable.renameColumn(spark, root, "s", "t")
      val q2 = spark.read.format("tx").load(root).agg(max("t").as("mx"))
      assert(isMetadataAnswered(q2))
      assert(q2.collect().head.isNullAt(0))
      // an append WITHOUT statsCols degrades the answer to the scan
      TxTable.commit(spark, root, Seq((3L, "zz")).toDF("id", "t"),
        TxTable.Append)
      val q3 = spark.read.format("tx").load(root).agg(max("t").as("mx"))
      assert(!isMetadataAnswered(q3))
      assert(q3.collect().head.getString(0) == "zz")
    }
  }

  test("maintenance keeps the string-skipping surface: optimize and " +
      "CoW merge re-record sstat lines for rewritten files") {
    withRoot { root =>
      import spark.implicits._
      langTable(root)
      TxTable.optimize(spark, root, targetFiles = 2)
      val snap = TxTable.currentSnapshot(root).get
      assert(snap.files.forall(f => snap.strStats.get(f)
        .exists(_.exists(_.col == "lang"))),
        "optimize dropped the sstat surface")
      TxTable.mergeByKey(spark, root,
        Seq((0L, "en"), (100L, "ar")).toDF("id", "lang"), Seq("id"))
      val snap2 = TxTable.currentSnapshot(root).get
      assert(snap2.files.forall(f => snap2.strStats.get(f)
        .exists(_.exists(_.col == "lang"))),
        "merge dropped the sstat surface")
      // and the bounds still answer: min is now 'ar'
      val q = spark.read.format("tx").load(root).agg(min("lang").as("mn"))
      assert(isMetadataAnswered(q))
      assert(q.collect().head.getString(0) == "ar")
    }
  }
}
