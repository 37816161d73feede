package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Advanced7

/** Semantic invariants for the round-6 batch (q135-q139) — properties the
  * hash oracle cannot state (monotonicity, partition/conservation laws).
  */
class Advanced7Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("q135 deciles partition customers; cumulative share is monotone to 1") {
    val rows = Advanced7.q135LorenzDeciles(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    // NTILE balance: bucket sizes differ by at most 1
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    val shares = rows.map(_.getDouble(3))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b },
      s"cum_share not monotone: ${shares.toSeq}")
    assert(math.abs(shares.last - 1.0) < 1e-9)
    // revenue deciles are ordered worst-to-best: the top decile holds the
    // largest share of revenue
    val drev = rows.map(_.getDouble(2))
    assert(drev.last == drev.max)
  }

  test("q136 BM25 scores are positive and bounded by the idf sum; hits in 1..3") {
    val rows = Advanced7.q136Bm25(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) > 0.0)
      val hits = r.getLong(2)
      assert(hits >= 1 && hits <= 3)
    }
    // ordering contract: descending on the rounded score
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("q137 funnel counts are monotone down the steps") {
    val r = Advanced7.q137Funnel(spark, sf).collect().head
    val (v, c, p) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(v >= c && c >= p && p >= 0)
    assert(v > 0, "fixture should have at least one view")
  }

  test("q138 rolling 7-day distinct dominates the single-day distinct") {
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sf)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .distinct().groupBy("day").count()
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val rolling = Advanced7.q138RollingDistinct(spark, sf).collect()
    assert(rolling.nonEmpty)
    rolling.foreach { r =>
      val day = r.getTimestamp(0)
      assert(r.getLong(1) >= daily(day),
        s"$day: 7d window smaller than the day itself")
    }
  }

  test("q140 equi-depth bins are balanced, ordered, and non-overlapping") {
    val rows = Advanced7.q140EquidepthBins(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 20L))
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"unbalanced: ${sizes.toSeq}")
    // value ranges ascend without overlap (ties can touch, not cross)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2) || a.getDouble(3) == b.getDouble(2),
        s"bin ${a.getLong(0)} hi ${a.getDouble(3)} crosses bin ${b.getLong(0)} lo ${b.getDouble(2)}")
    }
  }

  test("q141 weighted median matches a brute-force fold at fixture scale") {
    import org.apache.spark.sql.functions._
    val r = Advanced7.q141WeightedMedian(spark, sf).collect().head
    val got = r.getDouble(1)
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice"), col("l_quantity").cast("long"),
        col("l_orderkey"), col("l_linenumber").cast("long"))
      .collect()
      .map(x => (x.getDouble(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .sortBy(t => (t._1, t._3, t._4))
    val tw = rows.map(_._2).sum
    var cum = 0L
    val expected = rows.find { t => cum += t._2; cum * 2 >= tw }.get._1
    assert(got == math.rint(expected * 100) / 100,
      s"got $got expected $expected (tw=$tw)")
    assert(r.getLong(2) == tw)
  }

  test("q142 streak lengths conserve each user's active-day count") {
    import org.apache.spark.sql.functions._
    val activeDays = Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct().groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Advanced7.q142Streaks(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == activeDays.keySet)
    rows.foreach { r =>
      val (u, longest, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(longest >= 1 && n >= 1)
      // islands partition the active days: n streaks of length <= longest
      // must cover exactly the user's active days
      assert(longest <= activeDays(u) && n <= activeDays(u))
      assert(longest + (n - 1) <= activeDays(u),
        s"user $u: $n islands with max $longest cannot fit ${activeDays(u)} days")
    }
  }

  test("q143 prefix filtering is lossless: output equals the brute-force join") {
    import org.apache.spark.sql.functions._
    val got = Advanced7.q143PpJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val d = Tables.documents(spark, sf).select(col("doc_id"), col("lang"),
      array_sort(array_distinct(split(col("text"), " "))).as("toks"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getSeq[String](2).toSet))
    val brute = (for {
      (ia, la, ta) <- d; (ib, lb, tb) <- d
      if la == lb && ia < ib
      j = (ta & tb).size.toDouble / (ta | tb).size
      if j >= 0.95
    } yield (ia, ib, math.rint(j * 1e6) / 1e6)).toSet
    assert(got == brute,
      s"prefix filter lost/invented pairs: missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
    assert(got.forall(_._3 >= 0.95))
  }

  test("q144 every HLL rolling estimate is within tolerance of the exact twin") {
    val rows = Advanced7.q144RollingHll(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"${r.get(0)}: sketch estimate outside 5% of exact ${r.getLong(1)}")
    }
  }

  test("q145 windowed funnel is dominated by the unbounded q137 funnel") {
    val unbounded = Advanced7.q137Funnel(spark, sf).collect().head
    val windowed = Advanced7.q145FunnelWindowed(spark, sf).collect().head
    // same view population; each bounded step can only lose conversions
    assert(windowed.getLong(1) == unbounded.getLong(1))
    assert(windowed.getLong(2) <= unbounded.getLong(2))
    assert(windowed.getLong(3) <= unbounded.getLong(3))
    assert(windowed.getLong(2) >= windowed.getLong(3))
  }

  test("q139 cohort week-0 actives equal the cohort size") {
    import org.apache.spark.sql.functions._
    val rows = Advanced7.q139Retention(spark, sf).collect()
    assert(rows.forall(_.getLong(1) >= 0))
    val week0 = rows.filter(_.getLong(1) == 0L)
      .map(r => r.getTimestamp(0) -> r.getLong(2)).toMap
    val cohortSizes = Tables.events(spark, sf)
      .groupBy("user_id").agg(date_trunc("week", min(col("ts"))).as("cohort"))
      .groupBy("cohort").count()
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(week0 == cohortSizes,
      s"week-0 actives $week0 != cohort sizes $cohortSizes")
  }
}
