package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Curation

/** Property checks for the curation-stage operators (q90-q95) — the
  * oracle gate proves DuckDB equivalence; these pin the SEMANTIC
  * invariants the oracle alone would not catch if both engines drifted
  * together (conservation, bounds, bucket balance).
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q90 packing conserves tokens and numbers packs contiguously") {
    val packs = Curation.q90Pack(spark, sf).collect()
    val totalTokens = spark.read.parquet(s"$sf/documents.parquet")
      .select(sum(size(expr("regexp_extract_all(text, '\\\\S+', 0)"))))
      .head().getLong(0)
    assert(packs.map(_.getAs[Long]("pack_tokens")).sum == totalTokens,
      "packing must conserve every token")
    packs.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      val ids = rows.map(_.getAs[Long]("pack_id")).sorted
      assert(ids.head == 0 && ids.last == ids.length - 1,
        s"$lang pack ids must be contiguous from 0: ${ids.mkString(",")}")
    }
  }

  test("q91 every benchmark-source doc is flagged as contaminated") {
    val flagged = Curation.q91Contamination(spark, sf).collect()
    val flaggedIds = flagged.map(_.getAs[Long]("doc_id")).toSet
    // a doc whose tail IS a benchmark item must hit its own grams
    val benchIds = (0 until 500 by 25).map(_.toLong)
    assert(benchIds.forall(flaggedIds.contains),
      s"missing self-contaminated: ${benchIds.filterNot(flaggedIds.contains)}")
    assert(flagged.forall { r =>
      val f = r.getAs[Double]("frac"); f > 0.0 && f <= 1.0
    })
  }

  test("q92 systematic sample respects per-stratum rate bounds") {
    val rows = Curation.q92StratifiedSample(spark, sf).collect()
    assert(rows.map(_.getAs[String]("lang")).toSet ==
      Set("en", "de", "fr", "es", "zh"))
    rows.foreach { r =>
      val kept = r.getAs[Long]("n_kept"); val total = r.getAs[Long]("n_total")
      assert(kept <= total)
      // doc_id % 1000 over 0..499 covers each residue at most once, so the
      // kept count is exactly the residues below the rate that occur
      val permille = r.getAs[Long]("permille")
      assert(kept <= permille, s"${r.getAs[String]("lang")}: $kept > $permille")
    }
  }

  test("q93 deciles are balanced and exhaustive") {
    val bins = Curation.q93QualityBins(spark, sf).collect()
    assert(bins.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    val counts = bins.map(_.getAs[Long]("n"))
    assert(counts.sum == 500)
    assert(counts.max - counts.min <= 1, s"NTILE imbalance: ${counts.toSeq}")
    // deciles ordered by score: min of bin k >= max of bin k-1 is not
    // guaranteed at ties, but max must be non-decreasing
    val maxs = bins.map(_.getAs[Double]("max_score"))
    assert(maxs.zip(maxs.tail).forall { case (a, b) => a <= b })
  }

  test("q100 blocked fuzzy match finds every planted typo pair") {
    val pairs = Curation.q100FuzzyMatch(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // planted: char 12 deleted from every 10th title — shares the 8-char
    // block prefix and sits at levenshtein 1, so recall must be 1
    val planted = (0 until 500 by 10).map(i => (-i - 1L, i.toLong))
    val missing = planted.filterNot(pairs.contains)
    assert(missing.isEmpty, s"missing planted pairs: ${missing.take(5)}")
  }

  test("approx quality bins track exact NTILE without a global sort") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val approx = Curation.approxQualityBins(docs, bins = 10, relErr = 0.01)
    val plan = approx.queryExecution.executedPlan.toString
    // the scale property: no rangepartitioning (global sort) anywhere —
    // the exact-NTILE q93 pays one; this path must not
    assert(!plan.contains("rangepartitioning(score"), plan)
    val counts = approx.collect().map(r =>
      r.getAs[Long]("decile") -> r.getAs[Long]("n")).toMap
    val total = counts.values.sum
    assert(total == 500)
    // within sketch tolerance of balanced (50 per bin at this SF)
    counts.foreach { case (d, n) =>
      assert(math.abs(n - 50) <= 15, s"bin $d holds $n of $total")
    }
  }

  test("q94 chi-square divergence is non-negative, zero only for identical dist") {
    val rows = Curation.q94DomainDivergence(spark, sf).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Double]("chi2") >= 0.0))
    // languages genuinely differ from the global mix on this corpus
    assert(rows.exists(_.getAs[Double]("chi2") > 0.0))
  }

  test("q95 quantization error is bounded by one level width") {
    val rows = Curation.q95QuantizeError(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == 500)
    // |x - recon| <= scale = (mx - mn)/255; embeddings are ~N(0,1) so the
    // per-vector range never exceeds ~12 sigma -> level width < 0.05
    rows.foreach { r =>
      val worst = r.getAs[Double]("worst_err")
      assert(worst >= 0.0 && worst < 0.05, s"worst_err $worst out of bound")
    }
  }
}
