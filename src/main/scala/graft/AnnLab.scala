package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.similarity.{Knn, LshAnn}

/** ANN measurement harness (dev tool, like MakeScale/BenchOne) — the
  * numbers behind SCALE.md §"ANN serving head-to-head" and the
  * NBands/BBits → recall/candidate curve (r10 VERDICT tasks 3 and 6).
  *
  * Usage: runMain graft.AnnLab <sfDir> [curve|h2h|both]
  *
  * Every recall is measured on the PLAIN corpus (no planted twins) against
  * exact q28 top-[[Knn.TopK]], so the three postures are apples-to-apples:
  * a twin would occupy a top-k slot in the approximate answer but not in
  * the exact one, deflating recall by construction rather than by quality.
  * Times are min-of-3 noop-sink runs on a warmed session (BenchOne's
  * protocol) — compare within a boot, not across.
  */
object AnnLab {

  private def recallAt(exact: Set[(Long, Long)], approx: DataFrame): Double = {
    val got = approx.select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    exact.intersect(got).size.toDouble / exact.size
  }

  private def timeOf(df: => DataFrame): Double =
    (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val d = args(0)
    val mode = if (args.length > 1) args(1) else "both"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val corpus = Tables.embeddings(spark, d).select("vec_id", "embedding")
    val queries = LshAnn.queriesOf(spark, d)
    val nCorpus = corpus.count()
    val exact = Knn.q28Knn(spark, d).select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[annlab] dir=$d corpus=$nCorpus exact_pairs=${exact.size}")

    if (mode == "h2h" || mode == "both") {
      // q157's shipped banding on the plain corpus; q29/q156 are already
      // plain-corpus queries
      val postures = Seq(
        ("ivf_q29", () => Knn.q29AnnIvf(spark, d)),
        ("ivfpq_rerank_q156", () => Knn.q156AnnRerank(spark, d)),
        ("lsh_q157", () => LshAnn.annLshOn(corpus, queries)))
      postures.foreach { case (name, mk) =>
        val r = recallAt(exact, mk())
        val t = timeOf(mk())
        println(f"[annlab] h2h posture=$name recall@${Knn.TopK}=$r%.3f " +
          f"time_s=$t%.2f")
      }
      println(s"[annlab] h2h exact_q28 time_s=" +
        f"${timeOf(Knn.q28Knn(spark, d))}%.2f")
    }

    if (mode == "curve" || mode == "both") {
      // full-signature splits (16x4, 8x8, 4x16) plus reduced-band points
      // at each width: the two dials of the occupancy formula
      // E[cand/query] = nBands * N / 2^bBits, measured against recall
      val configs = Seq((16, 4), (8, 4), (2, 8), (4, 8), (8, 8),
        (2, 16), (4, 16))
      configs.foreach { case (nb, bb) =>
        val cand = LshAnn.candidatePairs(corpus, queries, nb, bb)
          .groupBy("qid").count().select("count").collect().map(_.getLong(0))
        val meanCand = if (cand.isEmpty) 0.0 else cand.sum.toDouble / 10
        val maxCand = if (cand.isEmpty) 0L else cand.max
        val r = recallAt(exact, LshAnn.annLshOn(corpus, queries, nb, bb))
        println(f"[annlab] curve nbands=$nb%2d bbits=$bb%2d " +
          f"recall@${Knn.TopK}=$r%.3f cand_mean=$meanCand%.1f " +
          f"cand_max=$maxCand")
      }
    }
    spark.stop()
  }
}
