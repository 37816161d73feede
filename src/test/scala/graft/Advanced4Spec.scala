package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Advanced4

/** Semantic invariants for q126-q129 beyond the DuckDB oracle. */
class Advanced4Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q126 mutual information is non-negative and bounded by entropies") {
    val r = Advanced4.q126MutualInfo(spark, sf).collect().head
    val mi = r.getAs[Double]("mi_nats")
    assert(mi >= -1e-4, s"MI must be >= 0 (up to rounding), got $mi")
    // MI <= min(H(X), H(Y)) <= ln(max cardinality); 5 priorities, ln(5)
    assert(mi <= math.log(5.0) + 1e-4)
  }

  test("q127 feature hashing is total and stable across runs") {
    val a = Advanced4.q127FeatureHash(spark, sf).collect()
    val b = Advanced4.q127FeatureHash(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    val totalTokens = spark.read.parquet(s"$sf/documents.parquet")
      .select(sum(size(expr("regexp_extract_all(text, '\\\\S+', 0)"))))
      .head().getLong(0)
    assert(a.map(_.getAs[Long]("n_tokens")).sum == totalTokens,
      "every token lands in exactly one bucket")
    assert(a.forall { r =>
      val bkt = r.getAs[Long]("bucket"); bkt >= 0 && bkt < 64
    })
  }

  test("q128 PMI identity holds: pmi == ln(p_xy/(p_x*p_y)) recomputed") {
    val rows = Advanced4.q128PmiCollocations(spark, sf).collect()
    // at sf0.001 the tiny corpus may or may not clear the count floor;
    // when it does, each row must satisfy the PMI definition recomputed
    // from scratch on the driver
    if (rows.nonEmpty) {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("text").collect().map(_.getString(0))
      val toks = docs.map(_.split("\\s+").filter(_.nonEmpty))
      val uni = toks.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val big = toks.flatMap(ws => ws.dropRight(1).zip(ws.drop(1)))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val tu = uni.values.sum.toDouble
      val tb = big.values.sum.toDouble
      rows.foreach { r =>
        val Array(w1, w2) = r.getAs[String]("bigram").split(" ")
        val expect = math.log((big((w1, w2)) / tb) /
          ((uni(w1) / tu) * (uni(w2) / tu)))
        assert(math.abs(r.getAs[Double]("pmi") - expect) < 1e-3,
          s"bigram ${r.getAs[String]("bigram")}")
      }
    }
  }

  test("q129 transition rows are probabilities that sum to 1 per source") {
    val rows = Advanced4.q129Transitions(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (from, rs) =>
      val psum = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(psum - 1.0) < 1e-3, s"$from rows sum to $psum")
      rs.foreach(r => assert(r.getAs[Double]("p") > 0.0))
    }
  }
}
