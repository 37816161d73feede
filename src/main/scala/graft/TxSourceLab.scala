package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

import graft.operators.TxTable
import graft.sources.TxFileIndex

/** Dev lab: planning-time cost of the `format("tx")` pruning seam at
  * cluster-scale file counts. Synthesizes snapshots (file names + stat/
  * part metadata only — `prunedFiles` never touches disk) and times the
  * filter translation + per-file evaluation that runs inside Catalyst's
  * `listFiles` during query planning. The question this answers for
  * SCALE.md: at 10⁵-10⁶ files, is the driver-side prune still
  * negligible next to everything else planning does? Not part of the
  * driver contract — `runMain graft.TxSourceLab`.
  */
object TxSourceLab {

  private def synthSnap(n: Int): TxTable.Snapshot = {
    val langs = Array("de", "en", "fr", "ja", "zh")
    val files = (0 until n).map(i => f"data/w-lab/p$i%07d.parquet")
    val stats = files.zipWithIndex.map { case (f, i) =>
      val lo = (i % 1000) * 10.0
      f -> Seq(("n_chars", lo, lo + 9.0, 0L))
    }.toMap
    val parts = files.zipWithIndex.map { case (f, i) =>
      f -> Seq(("lang", Some(langs(i % langs.length)): Option[String]))
    }.toMap
    TxTable.Snapshot(0L, files, stats = stats, parts = parts,
      schema = Some(StructType(Seq(
        StructField("lang", StringType), StructField("n_chars", LongType)))))
  }

  def main(args: Array[String]): Unit = {
    val lang = AttributeReference("lang", StringType)()
    val chars = AttributeReference("n_chars", LongType)()
    val pred = Seq(
      EqualTo(lang, Literal.create("en", StringType)),
      And(GreaterThanOrEqual(chars, Literal(2000L)),
        LessThan(chars, Literal(2500L))))
    Seq(10000, 100000, 1000000).foreach { n =>
      val idx = new TxFileIndex("/tmp/lab-nonexistent", synthSnap(n))
      // warm + measure best-of-5
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val kept = idx.prunedFiles(pred)
        val dt = (System.nanoTime() - t0) / 1e6
        (dt, kept.size)
      }
      val best = times.map(_._1).min
      println(f"[txsourcelab] files=$n%7d kept=${times.head._2}%6d " +
        f"prune_ms=$best%8.2f (${best * 1e6 / n}%6.1f ns/file)")
    }
  }
}
