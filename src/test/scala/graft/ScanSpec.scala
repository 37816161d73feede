package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scan

/** operators.Scan must be value-identical to the single-partition window
  * forms it replaces, for any partition count — including partitions
  * that end up empty and a partition count of 1.
  */
class ScanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic, shuffled, with a duplicate-free order key (k) and a
  // value column with repeats and sign changes
  private def fixture = spark.range(0, 997)
    .select(pmod(col("id") * 389, lit(997)).as("k"),
      (pmod(col("id") * 31, lit(50)) - 25).as("v"))

  test("withGlobalRowNumber matches row_number over a global window") {
    val expected = fixture
      .withColumn("rn", row_number().over(Window.orderBy("k")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    for (p <- Seq(1, 3, 7, 2000)) {
      val got = Scan.withGlobalRowNumber(fixture, Seq(col("k")), "rn",
        partitions = p)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      assert(got == expected, s"partitions=$p")
    }
  }

  test("withGlobalRowNumber totalOut carries the exact row count") {
    val out = Scan.withGlobalRowNumber(fixture, Seq(col("k")), "rn",
      partitions = 5, totalOut = Some("n_total"))
    assert(out.select("n_total").distinct().as[Long].collect().toSeq == Seq(997L))
  }

  test("withRunningMax matches the exclusive unbounded-preceding window") {
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    val expected = fixture.withColumn("pm", max("v").over(w))
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toMap
    for (p <- Seq(1, 3, 7, 2000)) {
      val got = Scan.withRunningMax(fixture, Seq(col("k")), col("v"), "pm",
        partitions = p)
        .collect().map(r => (r.getLong(0), Option(r.get(2)))).toMap
      assert(got == expected, s"partitions=$p")
    }
  }

  test("withRunningSum matches the exclusive unbounded-preceding window") {
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    val expected = fixture.withColumn("ps", sum("v").over(w))
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toMap
    for (p <- Seq(1, 3, 7, 2000)) {
      val got = Scan.withRunningSum(fixture, Seq(col("k")), col("v"), "ps",
        partitions = p)
        .collect().map(r => (r.getLong(0), Option(r.get(2)))).toMap
      assert(got == expected, s"partitions=$p")
    }
  }

  test("edge cases: empty input, single row, all-equal leading keys") {
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", LongType), StructField("v", LongType))))
    assert(Scan.withGlobalRowNumber(empty, Seq(col("k")), "rn").count() == 0)
    assert(Scan.withRunningMax(empty, Seq(col("k")), col("v"), "pm").count() == 0)
    val one = spark.range(1).select(lit(7L).as("k"), lit(3L).as("v"))
    val r1 = Scan.withGlobalRowNumber(one, Seq(col("k")), "rn").collect()
    assert(r1.length == 1 && r1.head.getLong(2) == 1L)
    // all rows share the leading key (lo == hi -> single bucket): the
    // tie-breaker column must still produce a total order
    val ties = spark.range(0, 100)
      .select(lit(5L).as("k"), pmod(col("id") * 37, lit(100)).as("tb"))
    val rt = Scan.withGlobalRowNumber(ties, Seq(col("k"), col("tb")), "rn",
      partitions = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toMap
    assert((0L until 100L).forall(tb => rt(tb) == tb + 1))
  }

  // duplicate-heavy leading column under an outlier max: 900 rows hold
  // five small values (180 each), 100 rows sit at 1e9 — the shape where
  // min/max interpolation collapses to one hot bucket
  private def skewed = spark.range(0, 1000)
    .select(when(col("id") < 900, col("id") % 5)
        .otherwise(lit(1000000000L)).as("s"),
      col("id").as("tb"),
      (pmod(col("id") * 31, lit(50)) - 25).as("v"))

  test("equi-depth buckets bound skew where interpolation collapses to one bucket") {
    def maxShare(equiDepth: Boolean): Double = {
      val counts = Scan.bucketed(skewed, Seq(col("s"), col("tb")), 8,
          equiDepth = equiDepth)
        .groupBy("__pid").count().as[(Int, Long)].collect()
      counts.map(_._2).max.toDouble / counts.map(_._2).sum
    }
    val interp = maxShare(equiDepth = false)
    val depth = maxShare(equiDepth = true)
    assert(interp >= 0.85,
      s"fixture no longer adversarial for interpolation: $interp")
    // bounded by the max duplicate-value frequency (180/1000), not the
    // value range
    assert(depth <= 0.25, s"equi-depth skew not bounded: $depth")
  }

  test("equi-depth results are value-identical to the window forms") {
    val w = Window.orderBy("s", "tb")
    val expectedRn = skewed
      .withColumn("rn", row_number().over(w).cast("long"))
      .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
    val wx = w.rowsBetween(Window.unboundedPreceding, -1)
    val expectedPs = skewed.withColumn("ps", sum("v").over(wx))
      .collect().map(r => (r.getLong(1), Option(r.get(3)))).toMap
    for (p <- Seq(1, 3, 8, 64)) {
      val rn = Scan.withGlobalRowNumber(skewed, Seq(col("s"), col("tb")),
          "rn", partitions = p, equiDepth = true)
        .collect().map(r => (r.getLong(1), r.getLong(3))).toMap
      assert(rn == expectedRn, s"rn diverges at partitions=$p")
      val ps = Scan.withRunningSum(skewed, Seq(col("s"), col("tb")),
          col("v"), "ps", partitions = p, equiDepth = true)
        .collect().map(r => (r.getLong(1), Option(r.get(3)))).toMap
      assert(ps == expectedPs, s"ps diverges at partitions=$p")
    }
    // running max too, on the uniform fixture (covers null carry-in)
    val wm = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    val expectedPm = fixture.withColumn("pm", max("v").over(wm))
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toMap
    val pm = Scan.withRunningMax(fixture, Seq(col("k")), col("v"), "pm",
        partitions = 7, equiDepth = true)
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toMap
    assert(pm == expectedPm)
  }

  test("withRunningSum totalOut carries the exact grand total") {
    val out = Scan.withRunningSum(fixture, Seq(col("k")), col("v"), "ps",
      partitions = 5, totalOut = Some("tw"))
    val expected = fixture.agg(sum("v")).head().getLong(0)
    assert(out.select("tw").distinct().as[Long].collect().toSeq ==
      Seq(expected))
  }
}
