package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin
import graft.plans.AsOfMergeJoin

class AsOfMergeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def purchases = Tables.events(spark, sf)
    .filter(col("event_type") === "purchase")
    .select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("purchase_us"))
  private def views = Tables.events(spark, sf)
    .filter(col("event_type") === "view")
    .select(col("user_id"), unix_micros(col("ts")).as("view_us"),
      col("event_id").as("view_event_id"))

  test("merge exec equals the windowed composition on real data") {
    val viaWindow = AsOfJoin.backward(purchases, views,
        keys = Seq("user_id"), leftTime = "purchase_us",
        rightTime = "view_us", payload = Seq("view_us", "view_event_id"))
      .orderBy("event_id").collect()
    val viaMerge = AsOfMergeJoin.backward(purchases, views,
        key = "user_id", leftTime = "purchase_us",
        rightTime = "view_us", payload = Seq("view_us", "view_event_id"))
      .orderBy("event_id").collect()
    assert(viaMerge.length == viaWindow.length)
    assert(viaMerge.toSeq == viaWindow.toSeq)
  }

  test("edges: no prior match, exact-time tie, null right time dropped") {
    import spark.implicits._
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p0"), (2L, 10L, "p2"))
      .toDF("k", "lt", "name")
    val right = Seq(
      (1L, Some(100L), "exact"), (1L, Some(60L), "mid"),
      (1L, Some(10L), "early"), (2L, None, "nullt"))
      .toDF("k", "rt", "tag")
      .select(col("k"), col("rt").cast("long").as("rt"), col("tag"))
    val out = AsOfMergeJoin.backward(left, right, "k", "lt", "rt",
        payload = Seq("rt", "tag"))
      .orderBy("name").collect()
      .map(r => (r.getAs[String]("name"), r.getAs[String]("tag"))).toSeq
    // p0@50 → early@10; p1@100 → exact@100 (<= tie matches);
    // p2: only a null-time right row for key 2 → no match
    assert(out == Seq(("p0", "early"), ("p1", "exact"), ("p2", null)))
  }

  test("physical plan: merge exec node, no window, one exchange per side") {
    val plan = AsOfMergeJoin.backward(purchases, views,
        key = "user_id", leftTime = "purchase_us",
        rightTime = "view_us", payload = Seq("view_us", "view_event_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMergeJoin"), plan) // nodeName strips "Exec"
    assert(!plan.contains("Window"), plan)
    assert(plan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 2, plan)
  }

  test("merge exec equals windowed composition on random keyed series") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val rowGen = Gen.listOfN(24,
      Gen.zip(Gen.choose(1L, 4L), Gen.choose(0L, 30L), Gen.choose(100L, 999L)))
    val prop = Prop.forAllNoShrink(rowGen, rowGen) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t, _), i) => (k, t, i.toLong) }
        .toDF("k", "lt", "lid")
      val right = rs.toDF("k", "rt", "pid")
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select("lid", "pid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .sortBy(identity).toSeq
      val viaWindow = canon(AsOfJoin.backward(
        left, right, Seq("k"), "lt", "rt", payload = Seq("rt", "pid")))
      val viaMerge = canon(AsOfMergeJoin.backward(
        left, right, "k", "lt", "rt", payload = Seq("rt", "pid")))
      viaWindow == viaMerge
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }

  test("merge exec matches a brute-force reference on random inputs") {
    // equivalence with the windowed variant can't catch a bug BOTH share;
    // this pins ground truth: latest right row with rt <= lt, ties by
    // greatest (rt, pid)
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val rowGen = Gen.listOfN(20,
      Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 20L), Gen.choose(100L, 999L)))
    val prop = Prop.forAllNoShrink(rowGen, rowGen) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t, _), i) => (k, t, i.toLong) }.toDF("k", "lt", "lid")
      val right = rs.toDF("k", "rt", "pid")
      val got = AsOfMergeJoin.backward(left, right, "k", "lt", "rt",
          payload = Seq("rt", "pid"))
        .select("lid", "pid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      val expected = ls.zipWithIndex.map { case ((k, t, _), i) =>
        val candidates = rs.filter(r => r._1 == k && r._2 <= t)
        i.toLong -> (if (candidates.isEmpty) -1L
          else candidates.maxBy(r => (r._2, r._3))._3)
      }.toMap
      got == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(result.passed, result.status.toString)
  }

  test("ties on (key, time): greatest payload wins, matching window variant") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("k", "lt")
    val right = Seq((1L, 100L, 7L), (1L, 100L, 9L), (1L, 100L, 3L))
      .toDF("k", "rt", "pid")
    val viaMerge = AsOfMergeJoin.backward(left, right, "k", "lt", "rt",
      payload = Seq("pid")).select("pid").as[Long].head()
    val viaWindow = AsOfJoin.backward(left, right, Seq("k"), "lt", "rt",
      payload = Seq("pid")).select("pid").as[Long].head()
    assert(viaMerge == 9L)
    assert(viaWindow == 9L)
  }
}
