package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev lab (r12 VERDICT task 6): the q190 BPE training loop at a REAL
  * merge budget. q190's gate query learns 3 merges; the 100 TB posture
  * claims O(vocab) per round after the single corpus pass. This lab
  * runs the IDENTICAL per-round computation (pair-count aggregate over
  * the symbol table, total-order argmax frozen as a plan literal,
  * replace projection) to `nMerges` rounds and measures what the
  * 3-round demo never asks:
  *
  *  - **per-round cost vs round number** — the replace projections
  *    CHAIN, so without lineage control round n re-evaluates n
  *    projections over the checkpointed base: linear per-round growth,
  *    O(n²) total. The guard is a `localCheckpoint(true)` every
  *    `ckptEvery` rounds (bounding any plan to ≤ ckptEvery replaces)
  *    with the PREVIOUS checkpoint unpersisted after the next one
  *    materializes — so driver/block-manager memory holds at most two
  *    vocab-table copies however long the loop runs (the
  *    lineage/driver-memory question of VERDICT task 6);
  *  - **per-round cost vs corpus size** — run at two SFs: the symbol
  *    table is VOCABULARY-sized (Heaps-law sublinear), so per-round
  *    cost should be near-flat at 10× corpus (SCALE.md round-13 rows);
  *  - **trace prefix** — the first 3 (pair, freq) merges are printed
  *    and must equal q190's DuckDB-exact trace at the same SF (same
  *    computation, so a divergence = the lab broke the loop, loudly).
  *
  * Usage: runMain graft.BpeLab <sfDir> [nMerges=100] [ckptEvery=8]
  * Prints one JSON line: per-round ms for early/mid/late windows, the
  * first three merges, vocab rows.
  */
object BpeLab {

  /** One training round on the current symbol table: the argmax pair by
    * (count desc, pair) — q190's total order, so the trace is
    * deterministic — and the merged table.
    */
  private def mergeRound(cur: DataFrame)
      : Option[((String, Long), DataFrame)] = {
    val top = cur
      .select(split(col("rep"), "\\|").as("sym"), col("f"))
      .filter(size(col("sym")) >= 2)
      .select(explode_outer(expr(
        "transform(sequence(0, size(sym) - 2), " +
          "j -> concat(element_at(sym, j + 1), ' ', " +
          "element_at(sym, j + 2)))")).as("pair"), col("f"))
      .filter(col("pair").isNotNull)
      .groupBy("pair").agg(sum("f").as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(1)
      .collect()
    // empty = every word is one symbol: training CONVERGED (the whole
    // corpus vocabulary is in the merge table) — a real budget stops
    // here, it does not crash
    top.headOption.map { t =>
      val pair = t.getString(0)
      val merged = cur.select(replace(col("rep"),
        lit(pair.replace(" ", "|")), lit(pair.replace(" ", ""))).as("rep"),
        col("f"))
      ((pair, t.getLong(1)), merged)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nMerges = if (args.length > 1) args(1).toInt else 100
    val ckptEvery = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the one corpus-wide pass (identical to q190)
    val vocab = Tables.documents(spark, sfDir)
      .select(explode_outer(
        expr("regexp_extract_all(text, '\\\\S+', 0)")).as("wd"))
      .filter(col("wd").isNotNull)
      .groupBy("wd").agg(count(lit(1)).as("f"))
      .select(concat_ws("|", split(col("wd"), "")).as("rep"), col("f"))
      .localCheckpoint(true)
    val vocabRows = vocab.count()
    var cur = vocab
    var prevCkpt: DataFrame = vocab
    val roundMs = Array.newBuilder[Double]
    val trace = Seq.newBuilder[(Int, String, Long)]
    var converged = false
    for (i <- 1 to nMerges if !converged) {
      val t0 = System.nanoTime()
      mergeRound(cur) match {
        case None => converged = true
        case Some(((pair, freq), merged)) =>
          cur = merged
          if (i % ckptEvery == 0) {
            // bound the replace chain; then free the previous
            // checkpoint — the new one is already materialized (eager),
            // so nothing re-derives from the old blocks
            val ckpt = cur.localCheckpoint(true)
            if (prevCkpt ne vocab) prevCkpt.rdd.unpersist(false)
            prevCkpt = ckpt
            cur = ckpt
          }
          roundMs += (System.nanoTime() - t0) / 1e6
          if (i <= 3) trace += ((i, pair, freq))
      }
    }
    val ms = roundMs.result()
    def mean(xs: Seq[Double]): Double =
      if (xs.isEmpty) 0.0 else math.rint(xs.sum / xs.size * 10) / 10
    val n = ms.length
    val tr = trace.result()
      .map { case (i, p, f) => s"""{"i":$i,"pair":"$p","freq":$f}""" }
      .mkString("[", ",", "]")
    println(s"""{"lab":"bpe","sf":"$sfDir","n_merges":$n,""" +
      s""""converged":$converged,""" +
      s""""ckpt_every":$ckptEvery,"vocab_rows":$vocabRows,""" +
      s""""ms_r1_10":${mean(ms.take(10))},""" +
      s""""ms_mid":${mean(ms.slice(n / 2 - 5, n / 2 + 5))},""" +
      s""""ms_last10":${mean(ms.takeRight(10))},""" +
      s""""ms_total":${math.rint(ms.sum)},"trace3":$tr}""")
    spark.stop()
  }
}
