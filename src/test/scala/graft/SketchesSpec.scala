package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.cms

class SketchesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("CMS never underestimates: n_est >= n_exact for EVERY term, " +
      "not just the reported top-20") {
    import spark.implicits._
    val tc = Tables.documents(spark, sf)
      .select(explode_outer(expr("regexp_extract_all(text, '\\\\S+', 0)"))
        .as("term"))
      .filter(col("term").isNotNull)
      .groupBy("term").agg(count(lit(1)).as("n_exact"))
      .localCheckpoint(true)
    val sk = tc.agg(cms.cms_sketch(col("term"), col("n_exact")).as("sk"))
    val under = tc.crossJoin(broadcast(sk))
      .select(col("n_exact"),
        cms.cms_estimate(col("sk"), col("term")).as("n_est"))
      .filter(col("n_est") < col("n_exact"))
      .count()
    assert(under == 0L, s"CMS underestimated $under terms — impossible " +
      "unless update/estimate hash differently")
  }

  test("sketch is merge-order invariant: identical counters under any " +
      "partitioning (sums commute — unlike percentile sketches)") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (s"t${i % 37}", 1L))
    def sketchOf(parts: Int): Seq[Long] =
      rows.toDF("term", "w").repartition(parts)
        .agg(cms.cms_sketch(col("term"), col("w")).as("sk"))
        .collect()(0).getSeq[Long](0)
    val a = sketchOf(1)
    val b = sketchOf(7)
    val c = sketchOf(32)
    assert(a == b && b == c, "counters diverged across partitionings")
    assert(a.sum == 500L * 4, "each arrival lands in exactly d=4 buckets")
  }

  test("weighted build over counted terms == weight-1 build over the " +
      "raw stream (counters depend only on the multiset)") {
    import spark.implicits._
    val raw = Seq("a", "b", "a", "c", "a", "b").toDF("term")
      .withColumn("w", lit(1L))
    val counted = raw.groupBy("term").agg(count(lit(1)).as("w"))
    val s1 = raw.agg(cms.cms_sketch(col("term"), col("w")).as("sk"))
      .collect()(0).getSeq[Long](0)
    val s2 = counted.agg(cms.cms_sketch(col("term"), col("w")).as("sk"))
      .collect()(0).getSeq[Long](0)
    assert(s1 == s2)
  }

  test("estimate matches a hand-computed counter walk for a collision-free " +
      "singleton") {
    import spark.implicits._
    val df = Seq(("only", 7L)).toDF("term", "w")
    val got = df.agg(cms.cms_sketch(col("term"), col("w")).as("sk"))
      .select(cms.cms_estimate(col("sk"), lit("only")).as("e"))
      .collect()(0).getLong(0)
    assert(got == 7L)
  }
}
