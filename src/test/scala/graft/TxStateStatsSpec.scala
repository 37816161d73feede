package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TxTable
import graft.streaming.TxState

/** (band, bucket) stats on TxState state tables (r12 VERDICT task 7 —
  * the cluster-scale follow-up TxState's class doc deferred): a banded
  * fingerprint index (the q155/q158 state shape) written per batch with
  * `writeBatch(singleFile = false, statsCols = Seq("cell"))` over a
  * range arrangement on the composite cell id lands range-tight state
  * files, and [[TxState.readBeforePruned]] serves a probe from ONLY the
  * files whose recorded cell ranges intersect it — the pruned file set
  * is pinned exactly against the manifest, the probe answer is proven
  * identical to the unpruned read, and the `< batchId` time-travel
  * contract composes with pruning unchanged.
  */
class TxStateStatsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val bandedSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("ph", LongType),
    StructField("band", IntegerType), StructField("bucket", LongType),
    StructField("cell", LongType)))

  /** The q152/q155 banding with a composite (band, bucket) cell id —
    * one monotone long so a single range arrangement makes every state
    * file tight on it.
    */
  private def bandedCells(fp: DataFrame): DataFrame =
    graft.multimodal.Multimodal.phashBands(fp)
      .withColumn("cell",
        col("band").cast("long") * (1L << 16) + col("bucket"))

  private def corpus(seed: Int, n: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (seed * 1000L + i, rnd.nextLong()))
  }

  test("range-arranged banded state files prune exactly on recorded " +
      "cell ranges; probe == unpruned read; time travel composes") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_txstats_")
    try {
      val root = s"$tmp/banded"
      (0 until 3).foreach { b =>
        val banded = bandedCells(corpus(b + 1, 40).toDF("doc_id", "ph"))
          .repartitionByRange(4, col("cell"))
        TxState.writeBatch(banded, root, b.toLong, singleFile = false,
          statsCols = Seq("cell"))
      }
      val snap = TxTable.currentSnapshot(root).get
      assert(snap.files.size >= 8, s"want many files, got ${snap.files.size}")
      // every state file carries a recorded cell range
      snap.files.foreach(f =>
        assert(snap.stats.getOrElse(f, Seq.empty).exists(_._1 == "cell"),
          s"$f has no cell stats"))
      // probe one occupied cell: the pruned set must be EXACTLY the
      // files whose recorded range contains it
      val probeCell = TxState.readBefore(spark, root, bandedSchema)
        .select("cell").head().getLong(0)
      val preds = Seq(("cell", probeCell.toDouble, probeCell.toDouble))
      val want = snap.files.filter { f =>
        val Some((_, mn, mx, _)) =
          snap.stats(f).find(_._1 == "cell"): @unchecked
        mn <= probeCell && probeCell <= mx
      }.toSet
      val got = TxState.prunedStateFiles(root, Long.MaxValue, preds).toSet
      assert(got == want)
      assert(got.size < snap.files.size,
        "probe pruned nothing — the arrangement is not range-tight")
      // the pruned probe answers exactly what the whole-state scan does
      def ids(df: DataFrame) = df.filter(col("cell") === probeCell)
        .select("doc_id", "band").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
      assert(ids(TxState.readBeforePruned(spark, root, bandedSchema,
          Long.MaxValue, preds)) ==
        ids(TxState.readBefore(spark, root, bandedSchema)))
      // `< batchId` time travel composes with pruning: batch 2's replay
      // view prunes within the files of batches 0-1 only
      val histFiles =
        TxState.prunedStateFiles(root, 2L, Seq.empty).toSet
      val histPruned = TxState.prunedStateFiles(root, 2L, preds).toSet
      assert(histPruned.subsetOf(histFiles))
      assert((got -- histFiles).forall(f => !histPruned.contains(f)))
      assert(ids(TxState.readBeforePruned(spark, root, bandedSchema, 2L,
          preds)) ==
        ids(TxState.readBefore(spark, root, bandedSchema, 2L)))
      // drain results unchanged: the full state multiset is identical
      // through the pruned reader with an always-true predicate
      val all = TxState.readBefore(spark, root, bandedSchema)
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length)
      val allPruned = TxState.readBeforePruned(spark, root, bandedSchema,
          Long.MaxValue, Seq(("cell", Double.MinValue, Double.MaxValue)))
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length)
      assert(all.toMap == allPruned.toMap)
    } finally graft.streaming.Replay.deleteRecursively(tmp)
  }
}
