package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract). Each query is forced through
  * the `noop` sink so the full plan executes (a bare `.count()` lets
  * Catalyst prune projections and undercounts real work).
  *
  * Session hygiene: ~90 plans through one JVM accumulate state that
  * corrupts per-query timings (round-2 postmortem: q48 measured 22 s
  * in-bench vs 1.2 s standalone) — streaming memory-sink tables are never
  * dropped, localCheckpoint blocks from the iterative queries pin block-
  * manager memory, and cached relations pile up. [[cleanup]] runs OUTSIDE
  * the timed region after every iteration so each query starts from a
  * clean session.
  */
object Bench {

  /** Accumulates task-end spill/GC metrics between resets, so each timed
    * query window carries its own telemetry (r8 postmortem: the official
    * artifact recorded q143 at 95 s — 16× its stable band — with nothing
    * in the row to show WHY; spill/GC columns make a contaminated run
    * self-diagnosing).
    */
  private final class MetricsAccum extends SparkListener {
    val spillDiskB = new AtomicLong(0L)
    val spillMemB = new AtomicLong(0L)
    val gcMs = new AtomicLong(0L)
    override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
      val m = taskEnd.taskMetrics
      if (m != null) {
        spillDiskB.addAndGet(m.diskBytesSpilled)
        spillMemB.addAndGet(m.memoryBytesSpilled)
        gcMs.addAndGet(m.jvmGCTime)
      }
    }
    def reset(): Unit = { spillDiskB.set(0L); spillMemB.set(0L); gcMs.set(0L) }
  }

  private final case class QStat(sec: Double, spillDiskB: Long,
      spillMemB: Long, gcMs: Long, rerun: Boolean = false,
      err: Option[String] = None) {
    def failed: Boolean = err.nonEmpty
  }

  /** Previous round's per-query seconds from BENCH_FULL.json (either the
    * legacy `"name":sec` or the current `"name":{"sec":...}` row shape) —
    * the outlier-rerun baseline. Missing/unparseable file → no baseline,
    * no reruns.
    */
  private[graft] def priorSeconds(path: java.nio.file.Path): Map[String, Double] = {
    if (!java.nio.file.Files.exists(path)) return Map.empty
    val text = java.nio.file.Files.readString(path)
    val row = """"(q[0-9][0-9a-z_]*)":(?:\{"sec":)?([0-9.]+)""".r
    row.findAllMatchIn(text).map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** Reset session state between timed runs (not part of any query's cost). */
  private[graft] def cleanup(spark: SparkSession): Unit = {
    spark.streams.active.foreach { q =>
      // a wedged stream that refuses to stop WILL contaminate later
      // timings — surface it instead of swallowing
      try q.stop() catch { case e: Throwable =>
        System.err.println(s"[bench] stream stop failed (${q.name}): $e")
      }
    }
    // memory-sink tables from streaming queries land as temp views; every
    // query (re)registers what it reads, so dropping all is safe
    spark.catalog.listTables().collect()
      .filter(_.isTemporary)
      .foreach(t => spark.catalog.dropTempView(t.name))
    // dropTempView skips global_temp — sweep that namespace separately
    try spark.catalog.listTables("global_temp").collect()
      .foreach(t => spark.catalog.dropGlobalTempView(t.name))
    catch { case _: org.apache.spark.sql.AnalysisException => () } // namespace not materialized yet
    spark.catalog.clearCache()
    // localCheckpoint blocks (iterative CC) register as persistent RDDs
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    // reclaim unpersisted blocks/codegen garbage now, in the untimed
    // region, instead of mid-measurement (residual drag audit r3: 2-5×
    // in-bench vs standalone on some queries even after state cleanup)
    System.gc()
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Machine calibration, recorded alongside the totals: a fixed
    // single-thread ALU loop and a fixed 32-task shuffle. Per-query
    // timings swing ±30% ACROSS VM BOOTS of the same code (measured in
    // round 6: identical commits, 84.8 s vs 102.0 s totals), so a
    // round-over-round comparison needs these to separate "the machine
    // is slower today" from "the plan regressed".
    val calibCpu = {
      val t0 = System.nanoTime()
      var acc = 0L
      var x = 88172645463325252L
      var i = 0
      while (i < 400000000) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17; acc += x; i += 1
      }
      if (acc == 42L) System.err.println("") // defeat DCE
      (System.nanoTime() - t0) / 1e9
    }
    val calibShuffle = {
      val t0 = System.nanoTime()
      spark.range(0, 50000000L, 1, 32).selectExpr("id % 1000 AS k")
        .groupBy("k").count().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // JVM/codegen warmup outside the timed region — one query per major
    // execution family (hash agg, broadcast join, window), because q01's
    // aggregate alone leaves the join/exchange/window code paths cold and
    // the first queries to touch them (q03 ran second in r5: 2.29 s vs
    // ~1 s standalone) carry the JIT bill inside their timing.
    // Same-boot A/B (r7, calib_cpu 0.855): q03 in-bench 2.04 s vs
    // BenchOne min 1.77 s — a 1.15x residual, i.e. the warmup works;
    // the r5 "2x vs standalone" reading compared numbers from DIFFERENT
    // boots (the ~1 s claims came from a calib_cpu ~1.0 boot).
    Seq("q01_agg", "q03_star_join", "q05_window_rank").foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
    }
    cleanup(spark)
    // per-query spill/GC telemetry: listener accumulates task metrics,
    // drained+reset at each timed window's edges so windows don't bleed
    val mx = new MetricsAccum
    spark.sparkContext.addSparkListener(mx)
    def runOnce(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): QStat = {
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
      mx.reset()
      val t0 = System.nanoTime()
      // a crashed query must be DISTINGUISHABLE from a fast one (r9: ten
      // thrown queries recorded ~0.05 s with rc=0 and the 196 s "total"
      // looked like a 26% improvement) — capture the error into the stat
      val err = try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        Some(s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(200)}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
      val stat = QStat(dt, mx.spillDiskB.get, mx.spillMemB.get, mx.gcMs.get,
        err = err)
      cleanup(spark) // untimed: next run starts from a clean session
      stat
    }
    // two iterations, report the min: steady-state throughput, not
    // first-run JIT/planning warmup. Telemetry rides the min-time run.
    val prior = priorSeconds(java.nio.file.Paths.get("BENCH_FULL.json"))
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // a failed iteration never wins the min on time — its near-zero
      // elapsed is not a measurement
      val iters = (1 to 2).map(_ => runOnce(name, fn))
      val first = iters.filterNot(_.failed) match {
        case ok if ok.nonEmpty => ok.minBy(_.sec)
        case _ => iters.head
      }
      // outlier re-measurement (r8: the official artifact recorded q143
      // at 95.0 s against a 5.7-6.9 s seven-run band — not reproducible
      // at the same commit). A min that still exceeds 3× last round's
      // entry is more likely contamination (GC storm, page-cache loss,
      // co-tenant) than a real plan change, so measure once more and
      // keep the best; `rerun:true` marks the row as having needed it.
      val stat = prior.get(name) match {
        case Some(p) if first.sec > 3.0 * p =>
          val again = runOnce(name, fn)
          (if (again.sec < first.sec) again else first).copy(rerun = true)
        case _ => first
      }
      name -> stat
    }
    // The driver's output capture keeps only the LAST 2000 chars, so the
    // stdout contract line must fit inside that window or it arrives
    // head-truncated and unparseable (BENCH_r01-r04 all show
    // "parsed": null; ms precision alone was not enough once the surface
    // passed ~90 queries). The line therefore carries the total plus a
    // fixed HEADLINE subset (~1 per operator family, the scale-relevant
    // ones); the complete per-query map goes to BENCH_FULL.json (picked
    // up by the round-end commit) and to stderr for the log.
    def fmt(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val headline = Seq(
      "q01_agg", "q03_star_join", "q05_window_rank", "q08_topk_rank",
      "q14_sql_cte", "q17_flatten", "q18_percentiles", "q19_approx",
      "q25_dedup_exact", "q26_neardup_minhash", "q28_knn_exact",
      "q29_ann_ivf", "q31_stream_window", "q36_asof_join", "q40_cube",
      "q48_json", "q53_distinct_agg", "q58_subqueries", "q65_stream_join",
      "q66_bpe_tokens", "q71_dedup_clusters", "q72_salted_join",
      "q74_tfidf", "q77_pipeline", "q78_bucketed_join",
      "q100_fuzzy_match", "q104_recursive_cte", "q106_topk_agg",
      "q107_chunk_dedup", "q108_ewma", "q111_pagerank",
      "q118_inverted_index", "q119_bloom_prune", "q121_correlation",
      "q123_compaction",
      // round-6 scale-relevant representatives: distributed prefix scan,
      // bounded-fan-out sliding distinct (+ its HLL scale path), and the
      // recall-1 prefix-filtered similarity join
      "q135_lorenz_deciles", "q138_rolling_distinct", "q143_ppjoin",
      "q144_rolling_hll",
      // round-7: PII redaction (pure narrow regex pass) and SemDeDup
      // (IVF-bucketed in-cluster cosine pairs)
      "q147_pii_redaction", "q148_semantic_dedup",
      // round-10: compressed ANN + exact re-rank; zero-fit LSH ANN +
      // its streaming index twin
      "q154_ann_ivfpq", "q156_ann_rerank", "q157_ann_lsh", "q158_stream_ann",
      // round-8: the int64-domain 5-gram similarity join (top bench cost,
      // 2x cut by hashing shingles) and the payload perceptual-hash
      // near-dup on the q27 banding machinery
      "q149_ngram_jaccard", "q152_phash_neardup",
      // round-12: merge-on-read delete (deletion vectors) and the
      // manifest-reconstructed row-level change feed
      "q177_tx_delete_mor", "q181_tx_change_feed",
      // round-12 second half: broadcast decontamination and the
      // materialized-view-routed aggregate (scan-cost decoupling)
      "q184_decontaminate", "q187_matview_route",
      // round-13: the packaged CDF consumer (two cadences, one feed)
      // and the multi-column partition x stat pruned read
      "q196_tx_cdf_consumers", "q197_tx_partition2",
      // round-14: the format("tx") connector — Catalyst-planned manifest
      // pruning and the structured-streaming table tail
      "q201_tx_relation", "q202_tx_stream_source",
      // round-14: metadata-only RENAME/DROP lifecycle read through
      // alias-aware stat pruning
      "q205_tx_column_map",
      // round-14: the change feed as a structured-streaming source
      "q206_tx_stream_cdf",
      // round-16: dynamic partition pruning through the surfaced
      // partitionSchema, the exchange-free hash-bucketed join, and
      // zero-scan metadata aggregates
      "q208_tx_dpp", "q209_tx_bucket_join", "q210_tx_meta_count",
      // round-17: bucket-preserving optimize, the partition x bucket
      // grid, metadata GROUP BY, and DPP over MoR snapshots
      "q211_tx_bucket_optimize", "q212_tx_part_bucket",
      "q213_tx_meta_groupby", "q214_tx_dpp_mor", "q215_tx_meta_filter",
      // round-17 third wave: the zero-copy shallow clone lifecycle,
      // exact shared-span dedup, and SUM pushed to the manifest
      // (q216's MoR metadata aggs ride the full map — the headline
      // stdout line must stay under the driver's 2000-char capture)
      "q217_tx_clone", "q218_exact_substr", "q219_tx_meta_sum",
      // round-18: bucket-preserving MERGE
      "q223_tx_bucket_merge")
    val byName = results.toMap
    def dict(entries: Seq[(String, Double)]): String = entries
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val qs = dict(headline.flatMap(n => byName.get(n).map(n -> _.sec)))
    val total = results.map(_._2.sec).sum
    val calib =
      s""""calib_cpu":${fmt(calibCpu)},"calib_shuffle":${fmt(calibShuffle)}"""
    // BENCH_FULL rows carry the telemetry; the stdout contract line keeps
    // the original flat name→sec map (driver-parsed — do not change)
    val nFailed = results.count(_._2.failed)
    def jq(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val fullRows = results.map { case (n, st) =>
      "\"" + n + "\":{\"sec\":" + fmt(st.sec) +
        ",\"spill_disk_b\":" + st.spillDiskB +
        ",\"spill_mem_b\":" + st.spillMemB +
        ",\"gc_ms\":" + st.gcMs +
        ",\"rerun\":" + st.rerun +
        ",\"failed\":" + st.failed +
        st.err.map(e => ",\"err\":" + jq(e)).getOrElse("") + "}"
    }.mkString("{", ",", "}")
    val fullJson =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"n_failed":$nFailed,$calib,"queries":$fullRows,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_FULL.json"), fullJson + "\n")
    System.err.println(s"[bench-full] $fullJson")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"n_failed":$nFailed,$calib,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    // a bench with crashed queries is not a valid measurement — make the
    // process say so (the driver still gets the stdout line either way)
    if (nFailed > 0) sys.exit(1)
  }
}
