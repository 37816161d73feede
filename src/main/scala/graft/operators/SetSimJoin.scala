package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join with the full PPJoin filter stack
  * (Xiao et al.) — the recall-ONE alternative to LSH for high Jaccard
  * thresholds, generalized from q143 with the threshold as an exact
  * RATIONAL tNum/tDen (a float t*n rounds up at exact multiples and
  * silently breaks the recall guarantee; every pruning bound here is
  * integer arithmetic).
  *
  * Filter stack (all lossless at J >= tNum/tDen):
  *  - prefix filter: under a COMMON rarity order, a qualifying pair must
  *    share a token among each side's first |x| - ceil(t|x|) + 1 tokens
  *    (pigeonhole on the overlap requirement);
  *  - length filter: ceil(t|a|) <= |b| and symmetrically;
  *  - pair-level joint-prefix cut: overlap >= alpha(a,b) forces a shared
  *    token with rn <= n - alpha + 1 on BOTH sides simultaneously
  *    (alpha = ceil(t/(1+t)(|a|+|b|)); shared tokens keep their relative
  *    order under the common ranking, so the first shared row minimizes
  *    both rn's and survives the per-row filter for every true pair);
  *  - positional filter: a match at (ra, rb) caps the overlap at
  *    1 + min(|a|-ra, |b|-rb), which must reach alpha.
  * The exact-Jaccard verify then touches candidates, never all pairs.
  *
  * `load` is a factory producing a FRESH read of the input per call
  * (columns `id` long, `grp` group key, `toks` distinct token array):
  * the verify stage joins the token sets back on both sides, and two
  * independent reads keep the self-join unambiguous and the plan
  * re-scannable at any scale (AQE stage reuse dedupes the shared scan).
  * The tokenize -> corpus-frequency -> per-doc rarity-rank prefix stage
  * is built ONCE and materialized via [[Lineage.cut]] (~(1-t)·n rows).
  *
  * SetSimJoinSpec certifies recall 1 against the brute-force definition
  * across thresholds; q143 (word tokens, 19/20) and q149 (character
  * 5-grams, 19/20 — 3-grams at 9/10 were measured and REJECTED: near-
  * universal shingles destroyed prefix selectivity, see Advanced8.q149)
  * ride it at the driver gate.
  */
object SetSimJoin {

  def selfJoin(load: () => DataFrame, id: String, grp: String, toks: String,
      tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen out of (0,1]")
    val t = tNum.toDouble / tDen
    def base() = load().select(col(id).as("__id"), col(grp).as("__grp"),
      col(toks).as("__toks"))
    val prefix = Lineage.cut {
      // set size rides the narrow projection (the token array is distinct
      // by contract) rather than a count().over(doc) window — one
      // WindowExec instead of two. (Measured effect is small: the second
      // window's doc-only ordering was already satisfied by the rank
      // window's sort, so it cost a pass, not a sort — but one operator
      // is strictly simpler and the narrow form survives any future
      // reordering of the two.)
      val tok = base().select(col("__id"), col("__grp"),
        size(col("__toks")).as("__n"), explode_outer(col("__toks")).as("__term"))
      val freq = base() // independent read for the rarity order
        .select(explode_outer(col("__toks")).as("__term"))
        .groupBy("__term").agg(count(lit(1)).as("__tf"))
      val wDoc = Window.partitionBy("__id")
      // build prefix length: n - ceil(t*n) + 1, own-size bound (the
      // partner's size is unknown at build time)
      tok.join(freq, "__term")
        .withColumn("__rn", row_number().over(wDoc.orderBy("__tf", "__term")))
        .where(col("__rn") <=
          col("__n") - expr(s"($tNum * __n + ${tDen - 1}) DIV $tDen") + 1)
        .select(col("__term"), col("__id"), col("__grp"), col("__rn"),
          col("__n"))
    }
    val pa = prefix.select(col("__term").as("a_term"), col("__grp").as("a_grp"),
      col("__id").as("ia"), col("__rn").as("a_rn"), col("__n").as("a_n"))
    val pb = prefix.select(col("__term").as("b_term"), col("__grp").as("b_grp"),
      col("__id").as("ib"), col("__rn").as("b_rn"), col("__n").as("b_n"))
    // alpha = ceil(t/(1+t) * (na + nb)) with t = tNum/tDen
    val alpha = expr(
      s"($tNum * (a_n + b_n) + ${tNum + tDen - 1}) DIV ${tNum + tDen}")
    val cand = pa.join(pb,
        col("a_term") === col("b_term") && col("a_grp") === col("b_grp") &&
          col("ia") < col("ib"))
      .where(expr(s"($tNum * a_n + ${tDen - 1}) DIV $tDen") <= col("b_n") &&
        expr(s"($tNum * b_n + ${tDen - 1}) DIV $tDen") <= col("a_n"))
      .where(col("a_rn") <= col("a_n") - alpha + 1 &&
        col("b_rn") <= col("b_n") - alpha + 1)
      .where(lit(1) + least(col("a_n") - col("a_rn"),
        col("b_n") - col("b_rn")) >= alpha)
      .select(col("ia"), col("ib")).distinct()
    val sa = base().select(col("__id").as("ia"), col("__toks").as("ta"))
    val sb = base().select(col("__id").as("ib"), col("__toks").as("tb"))
    cand.join(sa, "ia").join(sb, "ib")
      .withColumn("jaccard",
        size(array_intersect(col("ta"), col("tb"))).cast("double") /
          size(array_union(col("ta"), col("tb"))))
      .where(col("jaccard") >= t)
      .select(col("ia"), col("ib"), round(col("jaccard"), 6).as("jaccard"))
  }
}
