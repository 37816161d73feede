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

  test("withRunningSum totalOut carries the exact grand total") {
    val out = Scan.withRunningSum(fixture, Seq(col("k")), col("v"), "ps",
      partitions = 5, totalOut = Some("tw"))
    val expected = fixture.agg(sum("v")).head().getLong(0)
    assert(out.select("tw").distinct().as[Long].collect().toSeq ==
      Seq(expected))
  }
}
