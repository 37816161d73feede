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
      // same predicate split group-first through the surfaced posture:
      // the lang equality decides 5 GROUP evals instead of n file evals,
      // and the stat walk runs only inside the one kept group — the
      // manifest-tree access shape on the flat manifest
      val pidx = new TxFileIndex("/tmp/lab-nonexistent", synthSnap(n),
        Seq(StructField("lang", StringType)))
      val gtimes = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        val kept = pidx.prunedGroups(Seq(pred.head), Seq(pred(1)))
        val dt = (System.nanoTime() - t0) / 1e6
        (dt, kept.iterator.map(_._2.size).sum)
      }
      val gbest = gtimes.map(_._1).min
      require(gtimes.head._2 == times.head._2,
        s"grouped prune kept ${gtimes.head._2}, flat kept ${times.head._2}")
      println(f"[txsourcelab] files=$n%7d kept=${gtimes.head._2}%6d " +
        f"grouped_prune_ms=$gbest%8.2f (surfaced partition posture)")
    }
    dppAb()
  }

  /** The r14 task-6 A/B: does surfacing recorded part columns as a real
    * `partitionSchema` (`option("partitionedRead", "true")`) buy
    * plan-level wins the flat data-filter posture cannot express? The
    * star-join shape where the answer can only be yes-or-no: a
    * lang-partitioned fact joined to a tiny (lang → region) dim with
    * the ONLY selective predicate on the dim side — flat has no fact
    * predicate to push (every file scans), surfaced gets dynamic
    * partition pruning off the broadcast. Reports wall time and the
    * scan's numFiles metric for both postures, best-of-3 each.
    */
  private def dppAb(): Unit = {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_txdpplab_")
    val factRoot = s"$tmp/fact"
    val dimRoot = s"$tmp/dim"
    val nLangs = 20
    // ~8M rows, 20 langs x 8 range slices -> ~160 files of ~50k rows
    TxTable.commit(spark, factRoot,
      spark.range(0, 8000000L)
        .select(col("id"),
          format_string("l%02d", pmod(col("id"), lit(nLangs.toLong)))
            .as("lang"),
          (col("id") % 9973L).as("payload"))
        .repartitionByRange(8, col("id")),
      TxTable.Overwrite, partitionBy = Some("lang"))
    TxTable.commit(spark, dimRoot,
      (0 until nLangs).map(i => (f"l$i%02d", s"r${i / 2}"))
        .toDF("lang", "region"),
      TxTable.Overwrite)
    val total = TxTable.currentSnapshot(factRoot).get.files.size
    def run(surfaced: Boolean): (Double, Long, Long) = {
      val r = spark.read.format("tx")
      val fact = (if (surfaced) r.option("partitionedRead", "true") else r)
        .load(factRoot)
      val dim = spark.read.format("tx").load(dimRoot)
        .filter(col("region") === "r3") // 2 of 20 langs
      val q = fact.join(dim, "lang")
        .agg(count(lit(1)).as("n"), sum("payload").as("s"))
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q.collect()
        (System.nanoTime() - t0) / 1e9
      }
      // the files the executed scan actually planned, AFTER dynamic
      // pruning: the FileScanRDD's partitions are built from the
      // dynamically-selected set (the "numFiles" SQLMetric only updates
      // the UI store, not the local object)
      val scanned = q.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.isInstanceOf[TxFileIndex] &&
                (!surfaced || f.relation.partitionSchema.nonEmpty) =>
            f.inputRDDs().head
              .asInstanceOf[org.apache.spark.sql.execution.datasources.FileScanRDD]
              .filePartitions.iterator.flatMap(_.files)
              .map(_.filePath.toString).distinct.size.toLong
        }.getOrElse(-1L)
      (times.min, scanned, q.collect().head.getLong(0))
    }
    val (tFlat, filesFlat, nFlat) = run(surfaced = false)
    val (tPart, filesPart, nPart) = run(surfaced = true)
    require(nFlat == nPart, s"posture changed the answer: $nFlat vs $nPart")
    println(f"[txsourcelab-dpp] files_total=$total flat: " +
      f"best_s=$tFlat%6.2f files_scanned=$filesFlat; partitionedRead: " +
      f"best_s=$tPart%6.2f files_scanned=$filesPart " +
      f"(speedup ${tFlat / tPart}%4.2fx, " +
      f"scan ${filesFlat.toDouble / math.max(filesPart, 1)}%4.1fx fewer files)")
    graft.streaming.Replay.deleteRecursively(tmp)
  }
}
