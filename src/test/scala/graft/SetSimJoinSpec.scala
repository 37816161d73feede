package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SetSimJoin

/** operators.SetSimJoin must be recall-1 and precision-1 against the
  * brute-force all-pairs Jaccard definition for ANY rational threshold —
  * the filter stack's integer bounds reparameterize with (tNum, tDen).
  */
class SetSimJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic corpus: random 8-25-token sets over a small vocabulary
  // (adversarially similar), plus planted exact duplicates and
  // one-token-edited near-duplicates, across two groups
  private def corpus: Seq[(Long, String, Seq[String])] = {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 60).map(i => s"w$i")
    val base = (0L until 80L).map { i =>
      val n = 8 + rnd.nextInt(18)
      (i, if (i % 2 == 0) "g1" else "g2",
        rnd.shuffle(vocab).take(n).toSeq.sorted)
    }
    val dups = (0 until 10).map { k =>
      val (id, g, toks) = base(k * 7)
      (1000L + k, g, toks) // exact duplicate: J = 1
    }
    val nearDups = (0 until 10).map { k =>
      val (id, g, toks) = base(k * 5 + 1)
      val edited = (toks.drop(1) :+ s"x$k").sorted // one-token edit
      (2000L + k, g, edited)
    }
    base ++ dups ++ nearDups
  }

  private def brute(tNum: Int, tDen: Int): Set[(Long, Long, Double)] = {
    val t = tNum.toDouble / tDen
    val c = corpus
    (for {
      (ia, ga, ta) <- c; (ib, gb, tb) <- c
      if ga == gb && ia < ib
      sa = ta.toSet; sb = tb.toSet
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= t
    } yield (ia, ib, math.rint(j * 1e6) / 1e6)).toSet
  }

  for ((tNum, tDen) <- Seq((1, 2), (4, 5), (9, 10), (19, 20), (1, 1))) {
    test(s"self-join equals brute force at t=$tNum/$tDen") {
      val df = corpus.toDF("id", "grp", "toks")
      val got = SetSimJoin.selfJoin(() => df, "id", "grp", "toks", tNum, tDen)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val expected = brute(tNum, tDen)
      assert(got == expected,
        s"t=$tNum/$tDen: missing=${(expected -- got).take(3)} " +
          s"extra=${(got -- expected).take(3)}")
      assert(expected.nonEmpty, "fixture should plant qualifying pairs")
    }
  }

  test("empty token arrays neither crash nor pair") {
    val df = Seq((1L, "g", Seq.empty[String]), (2L, "g", Seq.empty[String]),
      (3L, "g", Seq("a", "b"))).toDF("id", "grp", "toks")
    val got = SetSimJoin.selfJoin(() => df, "id", "grp", "toks", 1, 2)
      .collect()
    assert(got.isEmpty) // empty sets have no prefix tokens -> no candidates
  }
}
