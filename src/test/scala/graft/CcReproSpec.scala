package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pinned counterexamples for the r17 connected-components rewrite:
  * these two 12-vertex graphs drove the r16 label-propagation CC into
  * its Θ(diameter) regime (flat clusters bridged by a path — the min
  * label crawled one edge per round and maxRounds=6 expired with
  * silently wrong labels). Star contraction must label both exactly,
  * every time, within the same budget.
  */
class CcReproSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val cases = Seq(
    Seq((2L,0L),(8L,5L),(10L,5L),(4L,1L),(9L,4L),(0L,10L),(8L,6L),(11L,0L),
      (3L,4L),(4L,9L),(6L,6L),(4L,4L),(3L,7L),(7L,6L)),
    Seq((3L,7L),(10L,5L),(11L,2L),(9L,10L),(5L,4L),(10L,5L),(7L,9L),(0L,8L),
      (6L,0L),(11L,1L),(2L,3L),(5L,7L),(8L,5L),(3L,4L)))

  test("the two r16-refuting graphs label exactly under maxRounds = 6, 20 reps each") {
    import spark.implicits._
    for ((es, ci) <- cases.zipWithIndex; rep <- 1 to 20) {
      val vertices = (0L to 11L).map(Tuple1(_)).toDF("id")
      val edges = es.toDF("src", "dst")
      val got = graft.dedup.Clusters
        .connectedComponents(vertices, edges, maxRounds = 6)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val parent = scala.collection.mutable.Map((0L to 11L).map(v => v -> v): _*)
      def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
      val expected = (0L to 11L).map(v =>
        v -> (0L to 11L).filter(u => find(u) == find(v)).min).toMap
      assert(got == expected, s"case $ci rep $rep: got $got expected $expected")
    }
  }

  test("an expired round cap throws instead of returning unsound labels") {
    import spark.implicits._
    // a 64-vertex path cannot reach its star fixed point in one round;
    // pre-r18 the min-parent labels were returned anyway ("sound (if
    // unconverged)"), which is exactly the silent-wrong-label class the
    // r17 rewrite existed to kill — the cap must now fail loudly
    val vertices = (0L to 63L).map(Tuple1(_)).toDF("id")
    val edges = (0L until 63L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      graft.dedup.Clusters
        .connectedComponents(vertices, edges, maxRounds = 1).collect()
    }
    assert(ex.getMessage.contains("did not reach its fixed point"))
  }
}
