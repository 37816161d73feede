package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{matching, MatchKernels}
import graft.plans.JaroWinklerPruning

/** The optimizer rule must be (1) sound — the length bound can never
  * reject a pair the kernel would accept; (2) effective — the guard
  * lands in the plan, before the kernel in the conjunction; (3)
  * transparent — results identical with and without the rule.
  */
class JaroWinklerPruningSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("the 5t-4 length bound is sound (fuzz against the kernel)") {
    // three corpora: ASCII, multi-byte BMP (accented Latin + CJK), and
    // supplementary-plane (emoji — one code point = TWO UTF-16 units).
    // The guard compares Spark length() (code points) and the kernel now
    // iterates code points too, so the bound must hold on ALL of them;
    // the astral corpus is the round-7 contract-enforcement pin (a
    // code-unit kernel would make the guard unsound exactly there).
    val rnd = new scala.util.Random(7)
    val corpora = Seq(
      "key agg row scan slow fast table value part hash".split(' '),
      "clé café señor 北京 données tōkyō über straße 文字 中文".split(' '),
      "🚀 a🚀b 🎉🎊 x🧪 🔥data 🚀🚀".split(' '))
    for (words <- corpora; _ <- 1 to 5000) {
      val a = Seq.fill(rnd.nextInt(6))(words(rnd.nextInt(words.length))).mkString(" ")
      val b = Seq.fill(rnd.nextInt(6))(words(rnd.nextInt(words.length))).mkString(" ")
      val jw = MatchKernels.jaroWinkler(a, b)
      for (t <- Seq(0.81, 0.85, 0.9, 0.95)) {
        if (jw >= t) {
          // Spark's length(): code points — the unit the guard compares
          val la = a.codePointCount(0, a.length)
          val lb = b.codePointCount(0, b.length)
          val r = math.min(la, lb).toDouble / math.max(math.max(la, lb), 1)
          assert(r >= 5 * t - 4 - 1e-12,
            s"bound violated: jw($a, $b)=$jw but ratio $r < ${5 * t - 4}")
        }
      }
    }
  }

  test("kernel iterates code points, not UTF-16 units (astral transposition)") {
    // "🚀ab" vs "a🚀b": three code points each, match window
    // floor(3/2)-1 = 0 pairs only the diagonal — m=1 ('b'), so
    // jaro = (1/3 + 1/3 + 1/1) / 3 = 5/9. A code-unit walk sees 4-unit
    // strings with window 1, pairs the surrogate halves across the
    // swap, and returns 5/6 — the divergent input that used to be out
    // of contract (and the direction that breaks guard soundness: the
    // unit metric can exceed what the code-point lengths admit).
    val a = "🚀ab"
    val b = "a🚀b"
    assert(math.abs(MatchKernels.jaro(a, b) - 5.0 / 9) < 1e-12,
      s"expected code-point jaro 5/9, got ${MatchKernels.jaro(a, b)}")
    // equal astral strings: full similarity through the prefix boost path
    assert(MatchKernels.jaroWinkler("🚀🚀", "🚀🚀") == 1.0)
    // prefix boost counts code points: cap-4 prefix of astral text
    val p1 = "🚀🚀🚀🚀ab"
    val p2 = "🚀🚀🚀🚀ba"
    val jw = MatchKernels.jaroWinkler(p1, p2)
    val j = MatchKernels.jaro(p1, p2)
    assert(math.abs(jw - (j + 4 * 0.1 * (1 - j))) < 1e-12)
  }

  test("rule injects the length guard ahead of the kernel; results identical") {
    def query() = {
      val a = Tables.documents(spark, sf)
        .select(col("doc_id").as("ia"), substring(col("text"), 1, 40).as("ta"))
      val b = Tables.documents(spark, sf)
        .select(col("doc_id").as("ib"), substring(col("text"), 1, 40).as("tb"))
      a.join(b, col("ib") === col("ia") + 25)
        .where(matching.jaro_winkler(col("ta"), col("tb")) >= 0.9)
        .select("ia", "ib")
    }
    val before = query().collect().map(_.toString).sorted
    JaroWinklerPruning.enable(spark)
    try {
      val df = query()
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("length("),
        s"length guard missing from optimized plan:\n$optimized")
      // guard precedes the kernel in the conjunction → short-circuits
      val condLine = optimized.linesIterator
        .find(l => l.contains("jaro_winkler") && l.contains("length("))
        .getOrElse(fail(s"no combined filter line:\n$optimized"))
      assert(condLine.indexOf("length(") < condLine.indexOf("jaro_winkler"), condLine)
      val after = df.collect().map(_.toString).sorted
      assert(after.sameElements(before), "rule changed query results")
      // idempotence: re-optimizing an already-guarded plan adds nothing
      val twice = query().queryExecution.optimizedPlan.toString
      assert("length\\(".r.findAllIn(twice).length ==
        "length\\(".r.findAllIn(optimized).length)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == JaroWinklerPruning)
    }
  }

  test("disjunctive predicates are left untouched (guard only from top-level conjuncts)") {
    // jw(a,b) >= 0.9 OR ib % 7 = 0: the OR's second branch admits rows the
    // length guard would reject, so injecting a guard over the whole
    // condition would silently drop them. The rule must not fire here.
    def query() = {
      val a = Tables.documents(spark, sf)
        .select(col("doc_id").as("ia"), substring(col("text"), 1, 40).as("ta"))
      val b = Tables.documents(spark, sf)
        .select(col("doc_id").as("ib"), substring(col("text"), 1, 12).as("tb"))
      a.join(b, col("ib") === col("ia") + 25)
        .where(matching.jaro_winkler(col("ta"), col("tb")) >= 0.9 ||
          col("ib") % 7 === 0)
        .select("ia", "ib")
    }
    val before = query().collect().map(_.toString).sorted
    assert(before.nonEmpty, "test needs rows surviving via the OR branch")
    JaroWinklerPruning.enable(spark)
    try {
      val df = query()
      val p = df.queryExecution.optimizedPlan.toString
      assert(!p.contains("length("),
        s"guard must not fire on a JW predicate under OR:\n$p")
      val after = df.collect().map(_.toString).sorted
      assert(after.sameElements(before), "rule changed disjunctive query results")
      // a JW conjunct ALONGSIDE a disjunction still guards (top-level AND)
      val mixed = Tables.documents(spark, sf)
        .select(col("doc_id").as("ia"), substring(col("text"), 1, 40).as("ta"),
          substring(col("text"), 3, 40).as("tb"))
        .where(matching.jaro_winkler(col("ta"), col("tb")) >= 0.9 &&
          (col("ia") % 2 === 0 || col("ia") % 3 === 0))
      val mp = mixed.queryExecution.optimizedPlan.toString
      assert(mp.contains("length("),
        s"top-level JW conjunct next to an OR must still guard:\n$mp")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == JaroWinklerPruning)
    }
  }

  test("low thresholds are left untouched (bound vacuous at t <= 0.8)") {
    JaroWinklerPruning.enable(spark)
    try {
      val a = Tables.documents(spark, sf)
        .select(col("doc_id").as("ia"), col("text").as("ta"))
      val b = Tables.documents(spark, sf)
        .select(col("doc_id").as("ib"), col("text").as("tb"))
      val df = a.join(b, col("ib") === col("ia") + 25)
        .where(matching.jaro_winkler(col("ta"), col("tb")) >= 0.5)
      val p = df.queryExecution.optimizedPlan.toString
      assert(!p.contains("length("), s"guard should not fire at t=0.5:\n$p")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == JaroWinklerPruning)
    }
  }
}
