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

  test("withRunningSum totalOut carries the exact grand total") {
    val out = Scan.withRunningSum(fixture, Seq(col("k")), col("v"), "ps",
      partitions = 5, totalOut = Some("tw"))
    val expected = fixture.agg(sum("v")).head().getLong(0)
    assert(out.select("tw").distinct().as[Long].collect().toSeq ==
      Seq(expected))
  }
}
