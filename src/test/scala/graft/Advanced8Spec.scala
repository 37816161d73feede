package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Advanced8

/** q147 (PII redaction) and q148 (semantic dedup) — structural
  * invariants beyond the DuckDB hash oracle.
  */
class Advanced8Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q147 redacted text contains no residual PII surface") {
    val rows = Advanced8.q147PiiRedaction(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getString(4)
      assert(!red.contains("@"), s"email survived redaction: $red")
      assert(!red.matches(".*\\d{3}-\\d{4}.*"), s"phone survived: $red")
      assert(!red.matches(".*\\d{5,}.*"), s"digit run survived: $red")
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>") &&
        red.contains("<NUM>"), s"placeholders missing: $red")
      // constructed corpus: exactly one instance of each class per doc,
      // counted AFTER the previous pass (no double-counting of the
      // email's digits by the number pass)
      assert(r.getLong(1) == 1 && r.getLong(2) == 1 && r.getLong(3) == 1,
        s"counts off for custkey ${r.getLong(0)}: ${r.toSeq}")
    }
  }

  test("q148 drop decisions respect the keep-lowest-id policy") {
    val rows = Advanced8.q148SemanticDedup(spark, sf).collect()
    assert(rows.nonEmpty, "threshold yields no pairs on this corpus — fixture drifted")
    val dropped = rows.map(_.getLong(1)).toSet
    rows.foreach { r =>
      val (vecId, nDups, dupOf, maxSim) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(dupOf < vecId, "a vector can only be a duplicate of a LOWER id")
      assert(nDups >= 1 && maxSim >= 0.3)
    }
    // the keeper chain terminates: at least one earlier vector of every
    // dropped one is itself kept (min dup_of of the corpus is never
    // dropped — id 0-side anchors exist)
    val anchors = rows.map(_.getLong(3)).toSet -- dropped
    assert(anchors.nonEmpty, "no kept anchor vectors — policy degenerated")
  }

  test("q149 shingle filtering is lossless: output equals the brute-force join") {
    import org.apache.spark.sql.functions._
    val got = Advanced8.q149NgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val d = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map { r =>
        val t = r.getString(2)
        val grams = (0 to t.length - 5).map(i => t.substring(i, i + 5)).toSet
        (r.getLong(0), r.getString(1), grams)
      }
    val brute = (for {
      (ia, la, ga) <- d; (ib, lb, gb) <- d
      if la == lb && ia < ib
      j = (ga & gb).size.toDouble / (ga | gb).size
      if j >= 0.95
    } yield (ia, ib, math.rint(j * 1e6) / 1e6)).toSet
    assert(got == brute,
      s"filter lost/invented pairs: missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
  }

  test("q151 gate verdicts are conservation-consistent and non-trivial") {
    val rows = Advanced8.q151QualityGate(spark, sf).collect()
    assert(rows.nonEmpty)
    var anyFail = false
    rows.foreach { r =>
      val (n, kept, fwc, fmwl, fsw) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))
      // any single rule failure excludes a doc from the kept set
      Seq(fwc, fmwl, fsw).foreach(f => assert(kept <= n - f,
        s"${r.getString(0)}: kept $kept exceeds n - failures ($n - $f)"))
      assert(kept >= 0 && kept <= n)
      anyFail ||= (fwc + fmwl + fsw) > 0
    }
    assert(anyFail, "gate is vacuous on this corpus — recalibrate thresholds")
  }

  test("q148 is deterministic across re-evaluation") {
    val a = Advanced8.q148SemanticDedup(spark, sf).collect().map(_.toSeq).toSeq
    val b = Advanced8.q148SemanticDedup(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
