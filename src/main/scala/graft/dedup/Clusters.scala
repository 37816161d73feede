package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Cluster-level dedup: connected components over a near-dup edge set,
  * assigning every document the minimum doc_id of its component (the
  * canonical representative a dedup pipeline keeps). This is the step
  * AFTER pair generation (q26/q27/q33 produce edges; here a
  * deterministic edge set keeps the driver oracle exact).
  *
  * Algorithm: alternating large-star / small-star edge contraction
  * (Kiveris et al., SoCC'14) — per round the edge set itself re-parents
  * toward neighborhood minima and contracts to one star per component
  * in O(log² component-size) rounds, each round two grouped joins, all
  * hash-partitioned — the MapReduce-native CC that runs at any corpus
  * size. (Static-edge label propagation with pointer jumping, the r16
  * shape, is Θ(diameter) in the flat-clusters-bridged-by-a-path regime
  * — see connectedComponents' Scaladoc for the counterexample story.)
  */
object Clusters {

  /** Connected components by ALTERNATING large-star / small-star edge
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14) — each round rewrites the EDGE SET itself:
    * large-star hangs every neighbor larger than `x` off the minimum of
    * `x`'s closed neighborhood, small-star does the same for the
    * smaller-or-equal side, and the set contracts to one star per
    * component, centered at the component minimum, in O(log²
    * component-size) rounds (O(log) in practice).
    *
    * This replaced round-16's static-edge min-label propagation with
    * pointer jumping, which a PropertySpec counterexample proved to be
    * Θ(component DIAMETER), not the advertised O(log): once labels
    * collapse onto a few roots, there are no label chains left for the
    * jump to compress, and a min label crawls one graph edge per round
    * (two flat clusters bridged by a path moved their boundary one
    * vertex per round until maxRounds expired — silently wrong labels).
    * Star contraction has no such regime: the EDGES re-parent, so every
    * round halves star depths regardless of how the graph mixes with
    * the current parent structure.
    *
    * Termination is detected EXACTLY: a round whose output edge set
    * equals its input (two anti-join emptiness probes on the
    * just-checkpointed sets) is the fixed point, at which every edge is
    * (component-min, member) by the paper's invariant. `maxRounds`
    * stays as a pure safety cap.
    *
    * @param vertices  one column `id` (long)
    * @param edges     columns `src`, `dst` (long); treated as undirected
    * @param maxRounds safety cap on contraction rounds
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    // canonical undirected form (u < v), self-loops dropped: every edge
    // lives in exactly one row, so each star phase rewrites each edge
    // exactly once (from its larger endpoint's row in small-star, its
    // smaller endpoint's in large-star) and set-equality is well-defined
    var es = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    // per-INVOCATION chain ids: two CC loops running concurrently in one
    // session (parallel test suites; two jobs sharing a driver) must not
    // share a reliable-checkpoint chain, or one loop's round-k cut
    // deletes the other's live round-(k-1) files. TWO ALTERNATING chains
    // because the convergence probe reads BOTH round k-1 (`es`) and
    // round k (`next`): a single chain's round-k cut would delete round
    // k-1's reliable-checkpoint dir while exceptAll still needs it
    // (LineageSpec's reliable-posture q71 run caught exactly that —
    // FileNotFound on the just-deleted rdd dir); alternating means a cut
    // only ever reclaims round k-2, which nothing reads anymore
    val base = java.util.UUID.randomUUID()
    val chains = Array(s"cc_edges_a@$base", s"cc_edges_b@$base")
    es = graft.operators.Lineage.cut(es, chain = chains(1))
    // large-star: for every vertex x, every LARGER neighbor re-parents
    // to m = min(closed neighborhood of x) — each edge emitted from its
    // smaller endpoint's row; m <= x < nbr keeps the canonical form
    def largeStar(e: DataFrame): DataFrame = {
      val nb = e.select(col("u").as("x"), col("v").as("nbr"))
        .union(e.select(col("v").as("x"), col("u").as("nbr")))
      val mins = nb.groupBy("x").agg(min("nbr").as("mn"))
        .select(col("x").as("mx"), least(col("x"), col("mn")).as("m"))
      nb.filter(col("nbr") > col("x"))
        .join(mins, col("x") === col("mx"))
        .select(col("m").as("u"), col("nbr").as("v"))
        .distinct()
    }
    // small-star: every vertex x with smaller neighbors N (exactly the
    // `u` sides of its canonical edges) hangs N ∪ {x} off m = min(N)
    def smallStar(e: DataFrame): DataFrame = {
      val nb = e.select(col("v").as("x"), col("u").as("nbr"))
      val mins = nb.groupBy("x").agg(min("nbr").as("m"))
      val fromNbrs = nb.join(mins, "x")
        .filter(col("nbr") =!= col("m"))
        .select(col("m").as("u"), col("nbr").as("v"))
      val fromSelf = mins.select(col("m").as("u"), col("x").as("v"))
      fromNbrs.union(fromSelf).distinct()
    }
    // round fingerprint for the NEGATIVE convergence gate: cardinality
    // plus both endpoint sums. Differing fingerprints PROVE the sets
    // differ (sound to skip the anti-join); equal fingerprints prove
    // nothing and fall through to the exact probe — exactness still
    // rests on exceptAll alone (the CLAUDE.md exact-convergence rule).
    // The count alone was a dead gate on forest-shaped rounds: the edge
    // count equals #non-root vertices from round 1 on (measured on q71:
    // constant 4954 across all 10 rounds), so EVERY round paid the
    // anti-join; the parent sum keeps falling while edges re-parent
    // toward minima, so only genuine near-fixed-point rounds pay it
    // now (r19 opt round). The summed values are reduced mod 2^31 per
    // row so the Long accumulator provably cannot overflow below ~2^32
    // edges — Spark 4 runs ANSI mode by default, where a raw sum(id)
    // overflow would THROW mid-loop, not wrap (a reduced collision only
    // means one extra exact probe, same as before).
    def fingerprint(e: DataFrame): (Long, Long, Long) = {
      val r = e.agg(count(lit(1)),
        sum(pmod(col("u"), lit(2147483648L))),
        sum(pmod(col("v"), lit(2147483648L)))).collect()(0)
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }
    var esFp = fingerprint(es)
    var converged = esFp._1 == 0L // nothing to contract on an edgeless graph
    var i = 0
    while (i < maxRounds && !converged) {
      // truncate lineage per round or the plan doubles per iteration
      // and analysis hangs (the documented iterative-DataFrame rule)
      val next = graft.operators.Lineage.cut(
        smallStar(largeStar(es)), chain = chains(i % 2))
      // EXACT fixed-point check, cheap first: both sides are DISTINCT
      // sets, so equal cardinality + empty one-sided difference ⇒ equal
      // sets; the fingerprint gate means contracting rounds never pay
      // the anti-join, only the near-convergence ones do
      val nextFp = fingerprint(next)
      converged = nextFp == esFp && next.exceptAll(es).isEmpty
      es = next
      esFp = nextFp
      i += 1
    }
    // fail LOUDLY if the safety cap expired before the exact fixed
    // point: pre-convergence the edge set can still carry multiple
    // parents per vertex and a min-parent label CAN be wrong (this is
    // precisely the silent-wrong-label failure the r16 rewrite existed
    // to kill — q222's peel already REQUIREs convergence; same posture
    // here). With exact fixed-point detection and O(log²) rounds the
    // cap is unreachable on any real graph, which is exactly why
    // hitting it must throw rather than return. Chain bookkeeping is
    // dropped first so the failure path never leaks a lastCkpt entry.
    if (!converged) {
      graft.operators.Lineage.endChain(es, chains(0))
      graft.operators.Lineage.endChain(es, chains(1))
    }
    require(converged,
      s"connectedComponents: star contraction did not reach its fixed " +
        s"point within $maxRounds rounds (${esFp._1} edges left) — labels " +
        "would be unsound; raise maxRounds")
    // fixed point: es is one star per component, centered at the min.
    // min(u) per member: at the fixed point each member has exactly one
    // parent, so this is a plain lookup, not a tie-break
    val roots = es.groupBy(col("v").as("rid")).agg(min("u").as("rlabel"))
    val labels = vertices
      .join(roots, col("id") === col("rid"), "left")
      .select(col("id"), coalesce(col("rlabel"), col("id")).as("label"))
    graft.operators.Lineage.endChain(es, chains(0))
    graft.operators.Lineage.endChain(es, chains(1))
    labels
  }

  /** q71: chain-shaped edge set — consecutive doc_ids within a
    * (lang, length-bucket) group are near-dup edges, so each group forms
    * one path-graph component (worst case for propagation depth, which
    * is exactly what pointer jumping is for). The canonical id per
    * component is therefore the group minimum — giving the driver an
    * exact closed-form oracle for a genuinely iterative distributed
    * computation.
    */
  def q71DedupClusters(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 64).cast("int").as("bucket"))
    val w = Window.partitionBy("lang", "bucket").orderBy("doc_id")
    val edges = docs
      .withColumn("prev", lag("doc_id", 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("prev").as("src"), col("doc_id").as("dst"))
    // narrow shuffle width for the iteration: every round launches
    // 2 joins + a checkpoint over a label table of |docs| rows, so with
    // the session default width the loop is pure task-scheduling
    // overhead at test scale (a production corpus keeps the session
    // width — the knob is the caller's). NOTE: the override mutates
    // session-global conf with try/finally restore — correct for the
    // serial driver, but a library caller sharing one session across
    // concurrent queries should scope it via spark.newSession() instead
    // (concurrent plans compiled in the window would pick up width 8).
    // (AQE stays ON for the loop — A/B'd off in the r19 opt round and
    // it REGRESSED 6.3 → 8.6 s warm: AQE's partition coalescing turns
    // each round's 8-partition micro-shuffles into 1-task reads, which
    // outweighs its re-planning latency here, unlike the Replay drains'
    // stateful-stream case where the store count is what matters.)
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, "8")
    val labels =
      try connectedComponents(docs.select(col("doc_id").as("id")), edges)
      finally s.conf.set(key, prev)
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("cluster"),
        col("cluster_size"))
      .orderBy("doc_id")
  }

  val q71Sql: String =
    """WITH g AS (
      |  SELECT doc_id, lang, CAST(n_chars // 64 AS INT) AS bucket
      |  FROM documents),
      |lab AS (
      |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY lang, bucket) AS cluster
      |  FROM g)
      |SELECT doc_id, cluster,
      |  COUNT(*) OVER (PARTITION BY cluster) AS cluster_size
      |FROM lab ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q71_dedup_clusters" -> (q71DedupClusters _))

  val oracles: Map[String, String] = Map(
    "q71_dedup_clusters" -> q71Sql)
}
