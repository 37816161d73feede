package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RollingDistinct

/** Certification of operators.RollingDistinct across (grain, width):
  * the exact path must equal the brute-force trailing-window definition
  * computed driver-side, and the HLL path must stay within tolerance of
  * the exact path on every period. q138/q144 ride the operator at the
  * driver gate; this spec is what licenses OTHER widths/grains.
  */
class RollingDistinctSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ~40 days of synthetic events at hour resolution, keys with heavy
  // repeats, deterministic; some hours/days intentionally absent
  private def fixture = spark.range(0, 20000)
    .select(
      timestamp_micros((lit(1700000000000000L) +
        pmod(col("id") * 104729, lit(997)) * 3600000000L +
        (col("id") % 7) * 86400000000L)).as("ts"),
      pmod(col("id") * 31, lit(400)).as("uid"))

  private def bruteExact(grain: String, width: Int): Map[Long, Long] = {
    val pairs = fixture
      .select(unix_micros(date_trunc(grain, col("ts"))).as("cell"),
        col("uid"))
      .distinct().as[(Long, Long)].collect()
    val step = grain match {
      case "hour" => 3600000000L
      case "day" => 86400000000L
      case "week" => 604800000000L
    }
    val cells = pairs.map(_._1).distinct
    cells.map { c =>
      c -> pairs.filter(p => p._1 <= c && p._1 > c - width.toLong * step)
        .map(_._2).distinct.length.toLong
    }.toMap
  }

  for (grain <- Seq("hour", "day", "week"); width <- Seq(1, 3, 7)) {
    test(s"exact equals the brute-force window definition (grain=$grain width=$width)") {
      val got = RollingDistinct.exact(fixture, col("ts"), col("uid"),
          grain, width)
        .select(unix_micros(col("period")), col("n_distinct"))
        .as[(Long, Long)].collect().toMap
      assert(got == bruteExact(grain, width),
        s"grain=$grain width=$width diverges from the definition")
    }
  }

  for (grain <- Seq("hour", "day"); width <- Seq(3, 7)) {
    test(s"approx within 5% of exact on every period (grain=$grain width=$width)") {
      val exact = RollingDistinct.exact(fixture, col("ts"), col("uid"),
          grain, width)
        .select(unix_micros(col("period")), col("n_distinct"))
        .as[(Long, Long)].collect().toMap
      val approx = RollingDistinct.approx(fixture, col("ts"), col("uid"),
          grain, width)
        .select(unix_micros(col("period")), col("approx_distinct"))
        .as[(Long, Double)].collect().toMap
      assert(approx.keySet == exact.keySet)
      approx.foreach { case (p, a) =>
        val e = exact(p).toDouble
        assert(math.abs(a - e) <= math.max(e * 0.05, 5.0),
          s"period $p: approx $a vs exact $e (grain=$grain width=$width)")
      }
    }
  }

  test("width=1 degenerates to plain per-cell distinct") {
    val perDay = fixture
      .groupBy(date_trunc("day", col("ts")).as("period"))
      .agg(countDistinct("uid").as("n"))
      .select(unix_micros(col("period")), col("n"))
      .as[(Long, Long)].collect().toMap
    val got = RollingDistinct.exact(fixture, col("ts"), col("uid"), "day", 1)
      .select(unix_micros(col("period")), col("n_distinct"))
      .as[(Long, Long)].collect().toMap
    assert(got == perDay)
  }
}
