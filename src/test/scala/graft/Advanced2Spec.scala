package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Advanced2

/** Semantic invariants for q116-q120 beyond the DuckDB oracle. */
class Advanced2Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q116 mixture weights normalize and upweight small domains") {
    val rows = Advanced2.q116MixtureWeights(spark, sf).collect()
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    // temperature < 1 compresses the mass ratio: the smallest domain's
    // epochs (oversampling factor) must be >= the largest domain's
    val byMass = rows.sortBy(_.getAs[Long]("mass"))
    assert(byMass.head.getAs[Double]("epochs") >=
      byMass.last.getAs[Double]("epochs"))
  }

  test("q117 length buckets conserve docs and account waste exactly") {
    val rows = Advanced2.q117LengthBuckets(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    rows.foreach { r =>
      val cap = r.getAs[Long]("bucket") * r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("sum_chars") + r.getAs[Long]("padding_waste") == cap,
        s"bucket ${r.getAs[Long]("bucket")} accounting")
      val u = r.getAs[Double]("utilization")
      assert(u > 0.0 && u <= 1.0)
    }
  }

  test("q118 inverted index: df <= cf, posting heads sorted distinct") {
    val rows = Advanced2.q118InvertedIndex(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("df") <= r.getAs[Long]("cf"))
      val head = r.getAs[String]("postings_head").split(',').map(_.toLong)
      assert(head.length <= 5 && (head sameElements head.distinct.sorted),
        s"term ${r.getAs[String]("term")} posting head")
    }
  }

  test("q119 bloom-pruned join equals the plain join (no false negatives)") {
    val pruned = Advanced2.q119BloomPrune(spark, sf)
    val dim = Tables.orders(spark, sf).filter(col("o_custkey") < 100)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val plain = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
    assert(pruned.except(plain).isEmpty && plain.except(pruned).isEmpty)
  }

  test("q120 logprob scores are negative averages of a proper LM") {
    val rows = Advanced2.q120UnigramLogprob(spark, sf).collect()
    val tokens = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val lp = r.getAs[Double]("avg_logprob")
      assert(lp < 0.0, "every unigram prob < 1 so avg log < 0")
      assert(r.getAs[Long]("n_tokens") == tokens(r.getAs[Long]("doc_id")).toLong,
        "n_tokens matches the \\S+ tokenizer")
    }
  }
}
