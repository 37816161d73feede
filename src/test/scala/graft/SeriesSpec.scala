package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Series

/** Semantic invariants for the time-series / warehouse batch (q96-q98)
  * that the cross-engine oracle would miss if both engines drifted the
  * same way: grid completeness, interval chain integrity, rank-mass
  * conservation.
  */
class SeriesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q96 grid is dense: every hour x type cell present, counts conserved") {
    val rows = Series.q96Gapfill(spark, sf).collect()
    val hours = rows.map(_.getAs[java.sql.Timestamp]("hour")).distinct.sorted
    val types = rows.map(_.getAs[String]("event_type")).distinct
    assert(rows.length == hours.length * types.length,
      "grid must be the full cross product")
    // contiguous hourly grid: max - min == (cells - 1) hours
    val spanHours =
      (hours.last.getTime - hours.head.getTime) / 3600000L
    assert(spanHours == hours.length - 1, s"gap in grid: $spanHours vs ${hours.length - 1}")
    // zero-filled cells exist (the whole point of gap-fill at this SF)
    assert(rows.exists(_.getAs[Long]("n_events") == 0L))
    // conservation: grid total == raw event total
    val total = Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
  }

  test("q97 SCD2 intervals chain without gaps or overlaps per customer") {
    val rows = Series.q97Scd2(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (ck, rs) =>
      val sorted = rs.sortBy(r =>
        (r.getAs[java.time.LocalDateTime]("valid_from")
          .toEpochSecond(java.time.ZoneOffset.UTC),
          r.getAs[Long]("o_orderkey")))
      // exactly one open-ended current row, and it is the last one
      assert(sorted.count(_.getAs[Boolean]("is_current")) == 1, s"cust $ck")
      assert(sorted.last.getAs[Boolean]("is_current"), s"cust $ck")
      // each interval closes at the next version's start (chain property)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.time.LocalDateTime]("valid_to") ==
            b.getAs[java.time.LocalDateTime]("valid_from"),
            s"cust $ck chain break")
        case _ => ()
      }
    }
  }

  test("q101 constraints pass where the data is clean, fail where it is not") {
    val rows = Series.q101DqChecks(spark, sf).collect()
      .map(r => r.getAs[String]("check_name") ->
        (r.getAs[Double]("metric"), r.getAs[Boolean]("passed"))).toMap
    assert(rows.size == 5)
    // genuinely-clean surfaces verify
    assert(rows("orders_pk_unique")._2)
    assert(rows("orders_totalprice_complete")._2)
    assert(rows("lineitem_quantity_in_range")._2)
    assert(rows("orders_custkey_fk_orphans")._2)
    // ...and the suite DETECTS a real defect: the synthetic lineitem does
    // not key on (l_orderkey, l_linenumber) — the check must report the
    // violation, not mask it (that detection is the whole point of a DQ
    // gate; the oracle confirms both engines measure the same ratio)
    val (dupMetric, dupPassed) = rows("lineitem_compound_key_unique")
    assert(!dupPassed && dupMetric < 1.0, s"expected detected violation, got $dupMetric")
  }

  test("q98 rank mass is conserved and in-degrees sum to edge count") {
    val rows = Series.q98LinkAuthority(spark, sf).collect()
    val n = rows.length
    // every doc emits 2 edges, every edge lands on some doc
    assert(rows.map(_.getAs[Long]("in_deg")).sum == 2L * n)
    // damping conservation: sum(rank) = 0.15*n + 0.85*(sum in_deg)/2 = n
    val rankSum = rows.map(_.getAs[Double]("rank")).sum
    assert(math.abs(rankSum - n) < 1e-6, s"rank mass $rankSum != $n")
  }
}
