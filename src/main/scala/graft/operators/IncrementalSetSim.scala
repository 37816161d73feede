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
  * State lives in three transactional tables under `stateDir`
  * (`prefix/`, `toks/`, `pairs/` — [[graft.streaming.TxState]] on
  * [[TxTable]] manifests since r12) — the CDC-sink shape: at cluster
  * scale these are tables partitioned by the group key so the per-batch
  * history scan prunes to the groups the batch touches; the Bloom gate
  * then prunes within them. Every write commits under the (state,
  * batchId) txn (a replay whose first attempt landed no-ops at the
  * manifest) and every history read time-travels to the newest snapshot
  * strictly below the batch, so an at-least-once `foreachBatch` replay
  * of any batch leaves state and emitted pairs EXACTLY as a failure-free
  * run would (the r10 "exactly once under failure-free replay" caveat is
  * gone; ReplayIdempotenceSpec re-runs folds mid-drain — including a
  * crash between sibling-table commits — and asserts convergence).
  */
object IncrementalSetSim {

  import graft.streaming.TxState

  private val prefixSchema = StructType(Seq(
    StructField("__h", LongType), StructField("__grp", StringType),
    StructField("__id", LongType), StructField("__rn", IntegerType),
    StructField("__n", IntegerType)))
  private val toksSchema = StructType(Seq(
    StructField("__id", LongType), StructField("__toks",
      ArrayType(StringType))))

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

  /** History prefix-row count visible to `beforeBatch` — derived from the
    * parquet footers of the files actually present (driver-side metadata
    * reads, zero jobs), never a running sidecar count that a replayed
    * batch would double-add (the r10 `meta.count` hazard). At cluster
    * scale a CDC sink's table manifest carries this.
    */
  private[graft] def historyRows(s: SparkSession, stateDir: String,
      beforeBatch: Long = Long.MaxValue): Long =
    TxState.historyRows(s, s"$stateDir/prefix", beforeBatch)

  /** Process one arriving micro-batch (`__id` long, `__grp` string,
    * `__toks` distinct token array) against the accumulated state.
    * `batchId` keys every state write: re-invoking with the same id and
    * input (an at-least-once replay) overwrites the first attempt's
    * deltas in place and reads exactly the pre-batch history, so the
    * fold is idempotent.
    */
  def processBatch(s: SparkSession, batch: DataFrame, stateDir: String,
      tNum: Int, tDen: Int, batchId: Long): Unit = {
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
      // history = state of strictly-earlier batches, by explicit
      // file-list snapshot (correctness-bearing twice over: this batch's
      // candidate/verify plans must never see rows its own concurrent
      // appends write, and a REPLAYED batch must never read what its
      // first attempt committed as history — TxState's time-traveled
      // `< batchId` snapshot covers both)
      val histCount = historyRows(s, stateDir, batchId)
      val hist = TxState.readBefore(s, s"$stateDir/prefix", prefixSchema,
        batchId)
      val histToks = TxState.readBefore(s, s"$stateDir/toks", toksSchema,
        batchId)
      // the two state writes depend only on this batch's rows — never
      // on the gating decision — so they launch FIRST, run concurrently
      // with each other, and the toks write further overlaps the verify
      // job below (batch latency = max, not sum). Each delta is sized to
      // the ARRIVAL RATE, not the cluster (single file per batch dir):
      // shuffle-width small files per batch would multiply every later
      // history scan's task count by the batch count (the CDC sink's
      // compaction policy — TxState.compact — bounds the file count
      // too). The prefix write also materializes newPfx's cache blocks
      // for the candidate join below.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.global
      val prefixAppend = Future(
        TxState.writeBatch(newPfx, s"$stateDir/prefix", batchId))
      val toksAppend = Future(TxState.writeBatch(
        b.select(col("__id"), col("__toks")), s"$stateDir/toks", batchId))
      // the new-prefix-row count (gate decision + Bloom sizing) is read
      // from the parquet FOOTERS of the file the write just produced —
      // a driver-side metadata read, zero jobs, where a dedicated
      // count() was one whole extra job per batch of scheduling floor
      // (and an Observation metric stalled every batch on the async
      // listener bus — measured +5 s over the replay). An empty batch
      // writes no part files (0 input partitions), so the sum is 0.
      Await.result(prefixAppend, Duration.Inf)
      val nNewPfx = TxState.batchRows(s, s"$stateDir/prefix", batchId)
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

      // no coalesce: it would propagate up the narrow verify stage
      // and serialize the token-store scan to one task; the pairs
      // sink is read once at the end, so file count is irrelevant
      TxState.writeBatch(verifyWrite, s"$stateDir/pairs", batchId,
        singleFile = false)
      Await.result(toksAppend, Duration.Inf)
    } finally newPfx.unpersist(false)
  }

  /** The accumulated pair set (the converged result after a drain). */
  def pairs(s: SparkSession, stateDir: String): DataFrame =
    TxState.readBefore(s, s"$stateDir/pairs", StructType(Seq(
      StructField("ia", LongType), StructField("ib", LongType),
      StructField("jaccard", DoubleType))))
}
