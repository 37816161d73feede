package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental (stream-side) exact set-similarity join — [[SetSimJoin]]'s
  * filter stack re-derived for an APPEND-ONLY prefix index, so a
  * micro-batch stream of documents converges to the batch pair set
  * (VERDICT r7 stretch: "new docs vs indexed prefix history, q88's
  * Bloom-gate pattern").
  *
  * The one design change that makes incrementality possible: the batch
  * operator ranks tokens by CORPUS rarity, which shifts as documents
  * arrive — an incremental index built on it would need re-ranking
  * history every batch. But the prefix-filter recall theorem holds for
  * ANY fixed total order on tokens (rarity is only a selectivity
  * heuristic), so here tokens are ordered by `(xxhash64(token), token)`
  * — corpus-independent, deterministic, and total. History prefix rows
  * NEVER change; each batch appends its own and joins against the past.
  * The index stores the 8-byte token hash, not the string (the q149
  * int64-domain lesson): a hash collision can only add a candidate,
  * which the exact-Jaccard verify kills — recall is unaffected.
  *
  * Per arriving batch B (ids must be globally unique, disjoint from
  * history):
  *  1. build B's prefix rows under the fixed order: first
  *     n − ceil(t·n) + 1 tokens of the hash-sorted set (pigeonhole —
  *     same bound as the batch operator's build prefix);
  *  2. Bloom-gate the HISTORY index by B's prefix-hash set
  *     ([[graft.dedup.Dedup.bloomProbe]], q88's pattern — the filter is
  *     built over the SMALL new side and probes the big history scan,
  *     so a batch touching few tokens prunes most of the index before
  *     the join shuffle);
  *  3. candidate-join B's prefix against (gated history ∪ B) with the
  *     full lossless stack from [[SetSimJoin]] — length filter,
  *     pair-level joint-prefix cut, positional filter, all exact
  *     integer arithmetic (every bound is per-side (rn, n) symmetric,
  *     so they transfer verbatim to the ordered-by-hash ranks);
  *  4. exact-Jaccard verify against the token-set store, emit pairs
  *     with `least/greatest`-normalized ids;
  *  5. append B's prefix rows, token sets, and emitted pairs to state.
  *
  * Every qualifying pair (a, b) is emitted EXACTLY once — in the batch
  * where its later member arrives (both-new pairs are ordered `ia < ib`;
  * new-vs-history pairs exist in one direction only) — so the pair sink
  * needs no dedup and the union over batches equals the batch
  * definition for any partition of the corpus into batches
  * (IncrementalSetSimSpec certifies convergence against both
  * [[SetSimJoin.selfJoin]] and brute force, across batch splits).
  *
  * State lives in three append-mode parquet dirs under `stateDir`
  * (`prefix/`, `toks/`, `pairs/`) — the CDC-sink shape: at cluster
  * scale these are tables partitioned by the group key so the per-batch
  * history scan prunes to the groups the batch touches; the Bloom gate
  * then prunes within them.
  */
object IncrementalSetSim {

  private val prefixSchema = StructType(Seq(
    StructField("__h", LongType), StructField("__grp", StringType),
    StructField("__id", LongType), StructField("__rn", IntegerType),
    StructField("__n", IntegerType)))
  private val toksSchema = StructType(Seq(
    StructField("__id", LongType), StructField("__toks",
      ArrayType(StringType))))

  /** Read a state dir by an EXPLICIT file-list snapshot taken now.
    * Correctness-bearing: this batch's candidate/verify plans must never
    * see rows appended DURING the batch (the state appends run
    * concurrently with the verify job — see processBatch), and an
    * explicit path list is immune to re-listing no matter when Spark
    * materializes the file index.
    */
  private def readOrEmpty(s: SparkSession, dir: String,
      schema: StructType): DataFrame = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(_.getPath).sorted
    if (files.nonEmpty) s.read.schema(schema).parquet(files: _*)
    else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schema)
  }

  /** B's prefix rows under the fixed (xxhash64, token) order:
    * (__h, __grp, __id, __rn, __n).
    */
  private def prefixRows(batch: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    // hash-sorted token structs: struct ordering compares h then t — a
    // total order with deterministic tie-break on the token itself
    val ordered = expr(
      "array_sort(transform(__toks, t -> struct(xxhash64(t) AS h, t AS t)))")
    batch
      .select(col("__id"), col("__grp"), size(col("__toks")).as("__n"),
        ordered.as("__o"))
      .select(col("__id"), col("__grp"), col("__n"),
        posexplode(slice(col("__o"), lit(1),
          col("__n") - expr(s"($tNum * __n + ${tDen - 1}) DIV $tDen") + 1)))
      .select(col("col.h").as("__h"), col("__grp"), col("__id"),
        (col("pos") + 1).cast("int").as("__rn"), col("__n").cast("int"))
  }

  /** Cumulative history prefix-row count, tracked driver-side so the
    * Bloom-gate decision costs ZERO jobs (at cluster scale this is one
    * line in the CDC sink's manifest; here a sidecar text file).
    */
  private[graft] def readMeta(stateDir: String): Long = {
    val f = new java.io.File(s"$stateDir/meta.count")
    if (f.exists()) new String(
      java.nio.file.Files.readAllBytes(f.toPath)).trim.toLong
    else 0L
  }

  private[graft] def writeMeta(stateDir: String, n: Long): Unit = {
    new java.io.File(stateDir).mkdirs()
    java.nio.file.Files.write(
      new java.io.File(s"$stateDir/meta.count").toPath,
      n.toString.getBytes)
  }

  /** Row count of parquet files from their FOOTERS — a driver-side
    * metadata read, zero Spark jobs; replaces a dedicated per-batch
    * `count()` (one whole job of scheduling floor — and an Observation
    * metric stalled every batch on the async listener bus, measured
    * +5 s over a replay). Shared by the incremental sinks (q153, q155).
    */
  private[graft] def footerRows(s: SparkSession,
      paths: Iterable[String]): Long = {
    val hconf = s.sparkContext.hadoopConfiguration
    paths.toSeq.map { p =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(p), hconf))
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Process one arriving micro-batch (`__id` long, `__grp` string,
    * `__toks` distinct token array) against the accumulated state.
    */
  def processBatch(s: SparkSession, batch: DataFrame, stateDir: String,
      tNum: Int, tDen: Int): Unit = {
    require(tNum > 0 && tNum <= tDen, s"threshold $tNum/$tDen out of (0,1]")
    val t = tNum.toDouble / tDen
    // NOT checkpointed: a foreachBatch frame is backed by the source's
    // parquet files, so each of its three consumers (prefix build, verify
    // union, state append) is a cheap narrow re-scan — an eager
    // localCheckpoint here costs a whole extra job per batch for nothing
    // (bounded replays pay per-JOB scheduling overhead; the q65 lesson).
    val b = batch.select(col("__id"), col("__grp"), col("__toks"))
    // persisted: the hash-sort projection is the hot part of a batch and
    // has 3 downstream consumers (state append, candidate join, Bloom
    // build when armed); the append job is what materializes the cache.
    val newPfx = prefixRows(b, tNum, tDen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // snapshot BOTH state dirs' file lists before anything is appended
      // this batch (correctness-bearing — see readOrEmpty)
      val histCount = readMeta(stateDir)
      val hist = readOrEmpty(s, s"$stateDir/prefix", prefixSchema)
      val histToks = readOrEmpty(s, s"$stateDir/toks", toksSchema)
      // the two state appends depend only on this batch's rows — never
      // on the gating decision — so they launch FIRST, run concurrently
      // with each other, and the toks append further overlaps the verify
      // job below (batch latency = max, not sum). Safe because every
      // state-dir read in this batch's plans is pinned to the explicit
      // file-list snapshot above, so the appends can never leak this
      // batch's rows into its own candidate or verify scans — which
      // would double-count pairs (toksAll already unions the in-flight
      // batch explicitly). Each append is sized to the ARRIVAL RATE, not
      // the cluster (coalesce(1)): a micro-batch's state delta is one
      // file's worth, and writing shuffle-width small files per batch
      // multiplies every later history scan's task count by the batch
      // count (at cluster scale this is the CDC sink's compaction
      // policy — see q123). The prefix append also materializes newPfx's
      // cache blocks for the candidate join below.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.global
      val pfxDir = new java.io.File(s"$stateDir/prefix")
      def listPfx(): Set[String] = Option(pfxDir.listFiles())
        .getOrElse(Array.empty[java.io.File])
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(_.getPath).toSet
      val pfxBefore = listPfx()
      val prefixAppend = Future(newPfx.coalesce(1).write.mode("append")
        .parquet(s"$stateDir/prefix"))
      val toksAppend = Future(b.select(col("__id"), col("__toks"))
        .coalesce(1).write.mode("append").parquet(s"$stateDir/toks"))
      // the prefix-row count (gate decision + Bloom sizing + meta) is
      // read from the parquet FOOTERS of the file the append just wrote
      // — a driver-side metadata read, zero jobs, where a dedicated
      // count() was one whole extra job per batch of scheduling floor
      // (and an Observation metric stalled every batch on the async
      // listener bus — measured +5 s over the replay). An empty batch
      // writes no part files (0 input partitions), so the sum is 0.
      Await.result(prefixAppend, Duration.Inf)
      val nNewPfx = footerRows(s, listPfx() -- pfxBefore)
      // Bloom over the SMALL new side's prefix hashes, probing the big
      // history scan (q88's gate, direction flipped to fit CDC). The
      // footer count above is load-bearing (stat.bloomFilter NPEs on an
      // empty build side) AND sizes the filter. The gate stays DISARMED until
      // history is ~an order of magnitude past the arrival rate: below
      // that nearly every history row passes the filter anyway
      // (selectivity ~1 on a shared-vocabulary corpus — measured on the
      // sf0.1 replay, where each build job cost ~0.07-0.1 s of pure
      // scheduling and pruned nothing at hist/new ≤ 7), so it only pays
      // in the steady CDC state it exists for (hist/new in the
      // hundreds; IncrementalSetSimSpec exercises the armed path with a
      // skewed split).
      val histGated =
        if (nNewPfx == 0L || histCount == 0L) hist.limit(0)
        else if (nNewPfx * 8 >= histCount) hist
        else hist.filter(
          graft.dedup.Dedup.bloomProbe(s, newPfx, col("__h"), nNewPfx))

      val pa = newPfx.select(col("__h"), col("__grp"),
        col("__id").as("ia"), col("__rn").as("a_rn"), col("__n").as("a_n"))
      val pb = histGated.withColumn("__new", lit(false))
        .unionByName(newPfx.withColumn("__new", lit(true)))
        .select(col("__h"), col("__grp"), col("__id").as("ib"),
          col("__rn").as("b_rn"), col("__n").as("b_n"), col("__new"))
      val alpha = expr(
        s"($tNum * (a_n + b_n) + ${tNum + tDen - 1}) DIV ${tNum + tDen}")
      val cand = broadcast(pa).join(pb, Seq("__h", "__grp"))
        .where((!col("__new") && col("ia") =!= col("ib")) ||
          (col("__new") && col("ia") < col("ib")))
        .where(expr(s"($tNum * a_n + ${tDen - 1}) DIV $tDen") <= col("b_n") &&
          expr(s"($tNum * b_n + ${tDen - 1}) DIV $tDen") <= col("a_n"))
        .where(col("a_rn") <= col("a_n") - alpha + 1 &&
          col("b_rn") <= col("b_n") - alpha + 1)
        .where(lit(1) + least(col("a_n") - col("a_rn"),
          col("b_n") - col("b_rn")) >= alpha)
        .select(least(col("ia"), col("ib")).as("ia"),
          greatest(col("ia"), col("ib")).as("ib"))
      // no .distinct() on candidates: the verify's groupBy(ia, ib)
      // absorbs duplicate candidates (a pair matching on several shared
      // prefix tokens) for free — a distinct here was a whole extra
      // shuffle stage per batch

      // verify: candidates are ARRIVAL-RATE-bounded (a micro-batch's
      // surviving pairs), the token store is CORPUS-sized — so the
      // store must be read ONCE, narrow, never shuffled. Each pair is
      // exploded to two (pair, id) probe rows and broadcast through a
      // SINGLE hash-join over the store, then the two member token sets
      // meet again in one width-8 groupBy — one scan + one tiny
      // exchange, where the previous shape (cand ⋈ toks ⋈ toks) ran two
      // sequential broadcast sub-DAGs and scanned the store twice
      // (measured ~1.2 s/batch at sf0.1, ~0.3 s of it per sub-DAG of
      // pure scheduling floor)
      val toksAll = histToks
        .unionByName(b.select(col("__id"), col("__toks")))
      val probes = cand.select(explode(array(
        struct(col("ia"), col("ib"), col("ia").as("__id")),
        struct(col("ia"), col("ib"), col("ib").as("__id")))).as("e"))
        .select(col("e.ia"), col("e.ib"), col("e.__id"))
      val verifyWrite = broadcast(probes).join(toksAll, "__id")
        .groupBy(col("ia"), col("ib"))
        .agg(
          first(when(col("__id") === col("ia"), col("__toks")),
            ignoreNulls = true).as("ta"),
          first(when(col("__id") === col("ib"), col("__toks")),
            ignoreNulls = true).as("tb"))
        .withColumn("jaccard",
          size(array_intersect(col("ta"), col("tb"))).cast("double") /
            size(array_union(col("ta"), col("tb"))))
        .where(col("jaccard") >= t)
        .select(col("ia"), col("ib"), round(col("jaccard"), 6).as("jaccard"))

      verifyWrite
        // no coalesce: it would propagate up the narrow verify stage
        // and serialize the token-store scan to one task; the pairs
        // sink is read once at the end, so file count is irrelevant
        .write.mode("append").parquet(s"$stateDir/pairs")
      Await.result(toksAppend, Duration.Inf)
      writeMeta(stateDir, histCount + nNewPfx)
    } finally newPfx.unpersist(false)
  }

  /** The accumulated pair set (the converged result after a drain). */
  def pairs(s: SparkSession, stateDir: String): DataFrame =
    readOrEmpty(s, s"$stateDir/pairs", StructType(Seq(
      StructField("ia", LongType), StructField("ib", LongType),
      StructField("jaccard", DoubleType))))
}
