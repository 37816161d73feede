package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Advanced6

/** Semantic invariants for q133-q134 beyond the DuckDB oracle. */
class Advanced6Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q133 encoded values shrink raw means toward the global mean") {
    val rows = Advanced6.q133TargetEncoding(spark, sf).collect()
    assert(rows.length > 1)
    val weightedGlobal = {
      val n = rows.map(_.getAs[Long]("n")).sum.toDouble
      rows.map(r => r.getAs[Double]("raw_mean") * r.getAs[Long]("n")).sum / n
    }
    rows.foreach { r =>
      val raw = r.getAs[Double]("raw_mean")
      val enc = r.getAs[Double]("encoded")
      // the prior pulls the encoding strictly between raw and global
      // (allow rounding slack at the 4-decimal output grain)
      assert(enc >= math.min(raw, weightedGlobal) - 0.01 &&
        enc <= math.max(raw, weightedGlobal) + 0.01,
        s"${r.getAs[String]("c_mktsegment")}: $enc not between $raw and $weightedGlobal")
    }
  }

  test("q134 z-test matches a from-scratch two-proportion computation") {
    val r = Advanced6.q134AbTest(spark, sf).collect().head
    val (na, ca, nb, cb) = (r.getAs[Long]("n_a").toDouble,
      r.getAs[Long]("c_a").toDouble, r.getAs[Long]("n_b").toDouble,
      r.getAs[Long]("c_b").toDouble)
    val pPool = (ca + cb) / (na + nb)
    val z = (ca / na - cb / nb) /
      math.sqrt(pPool * (1 - pPool) * (1 / na + 1 / nb))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-3)
    assert(r.getAs[Boolean]("significant_95") == (math.abs(
      BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) > 1.96))
    assert(na + nb == Tables.events(spark, sf).count())
  }
}
