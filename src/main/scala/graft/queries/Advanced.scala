package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.{matching, topk}

/** Round-5 operator batch: bounded-heap group top-k (mergeable aggregate vs
  * the window sort), chunk-level exact substring dedup with document
  * reassembly, EWMA as a recursive CTE, decimal-routed z-score outliers,
  * Z-order multi-dimensional clustering keys, converged multi-iteration
  * PageRank, reproducible hash-weighted sampling, a 2-D skyline, a
  * k-anonymity audit, and Jaro-Winkler record matching.
  */
object Advanced {

  // ---------------------------------------------------------------- q106
  // Group-wise top-3 orders by price via the bounded-heap mergeable
  // aggregate (functions/TopKAggregate): map-side partial aggregation
  // discards non-top-k rows BEFORE the exchange, so the shuffle carries at
  // most k entries per (partition × group) — the at-scale replacement for
  // the ROW_NUMBER window, which shuffles and sorts every row of every
  // group. The oracle IS that window form: identical results, different
  // physical plan.
  // The null contract is pinned explicitly on BOTH sides: the heap skips
  // null scores/keys in update(), while ROW_NUMBER would rank null-price
  // rows (NULLS LAST) — so a nullable input would diverge silently
  // without the shared IS NOT NULL.
  def q106TopkAgg(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d)
      .where(col("o_totalprice").isNotNull)
      .groupBy((col("o_custkey") % 97).as("grp"))
      .agg(topk.topk_by(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("grp"), posexplode(col("top")))
      .select(col("grp"), (col("pos") + 1).cast("int").as("rank"),
        col("col.key").as("o_orderkey"), col("col.score").as("o_totalprice"))
      .orderBy("grp", "rank")
  }

  val q106Sql: String =
    """WITH ranked AS (
      |  SELECT o_custkey % 97 AS grp, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey % 97
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders WHERE o_totalprice IS NOT NULL)
      |SELECT grp, CAST(rn AS INTEGER) AS rank, o_orderkey, o_totalprice
      |FROM ranked WHERE rn <= 3 ORDER BY grp, rank""".stripMargin

  // ---------------------------------------------------------------- q107
  // Chunk-level exact substring dedup with document reassembly (the
  // distributed approximation of suffix-array training-data dedup, Lee et
  // al. 2022): documents split into 10-word chunks, every chunk kept only
  // at its first occurrence (min (doc_id, position) corpus-wide), then
  // documents rebuilt from their surviving chunks in order. One shuffle on
  // chunk text for the first-occurrence aggregate, one narrow join back —
  // at 100 TB the chunk table shards on the chunk hash with no all-pairs
  // comparison anywhere. Chunk arrays are exploded with posexplode_outer
  // so InferFiltersFromGenerate cannot clone the chunking expression into
  // a pre-filter (measured 15× tax on computed-array explodes).
  def q107ChunkDedup(s: SparkSession, d: String): DataFrame = {
    def chunks(df: DataFrame): DataFrame = df
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("nch", ceil(size(col("ws")) / lit(10.0)).cast("int"))
      .withColumn("chunks", expr(
        "transform(sequence(0, nch - 1), i -> array_join(slice(ws, i*10+1, 10), ' '))"))
      .select(col("doc_id"),
        posexplode_outer(col("chunks")).as(Seq("chunk_idx", "chunk")))
      .where(col("chunk").isNotNull)
    val first = chunks(Tables.documents(s, d)).groupBy("chunk")
      .agg(min(col("doc_id") * 100000L + col("chunk_idx")).as("fk"))
    // independent second read: chunk rows joined against an aggregate of
    // the same lineage would trip AMBIGUOUS_SELF_JOIN
    chunks(Tables.documents(s, d))
      .join(first, Seq("chunk"))
      .where(col("doc_id") * 100000L + col("chunk_idx") === col("fk"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        expr("array_join(transform(array_sort(collect_list(struct(chunk_idx, chunk)))," +
          " x -> x.chunk), ' ')").as("new_text"))
      .orderBy("doc_id")
  }

  val q107Sql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |ix AS (SELECT doc_id, ws,
      |        unnest(range(CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS ci FROM w),
      |ch AS (SELECT doc_id, ci AS chunk_idx,
      |        array_to_string(list_slice(ws, ci*10 + 1, ci*10 + 10), ' ') AS chunk
      |       FROM ix),
      |fst AS (SELECT chunk, MIN(doc_id * 100000 + chunk_idx) AS fk
      |        FROM ch GROUP BY 1),
      |kept AS (SELECT c.doc_id, c.chunk_idx, c.chunk
      |         FROM ch c JOIN fst f ON f.chunk = c.chunk
      |          AND c.doc_id * 100000 + c.chunk_idx = f.fk)
      |SELECT doc_id, COUNT(*) AS n_kept,
      |  array_to_string(list(chunk ORDER BY chunk_idx), ' ') AS new_text
      |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q108
  // Exponentially-weighted moving average per user — a sequential
  // recurrence (ewma_i = 0.2·x_i + 0.8·ewma_{i-1}) that no window frame
  // expresses. The scale-correct distribution is one shuffle on the
  // entity key, then a SEQUENTIAL fold inside each key via the
  // higher-order `aggregate` (codegen'd, parallel across users,
  // ordered within a user) — NOT the recursive-CTE loop, which executes
  // one cluster job per recursion depth (measured 12 s vs 0.4 s at
  // sf0.1 for depth 60). The recursive CTE survives as the DuckDB
  // oracle: both engines evaluate the identical double expression in
  // the identical sequential order, so the accumulation is
  // bit-reproducible across completely different execution shapes.
  // Rows are capped at 60 per user to match the oracle's recursion
  // budget.
  def q108Ewma(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, d)
      .where(col("user_id") < 40)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 60)
      .groupBy("user_id")
      .agg(expr(
        "transform(array_sort(collect_list(struct(rn, value))), p -> p.value)")
        .as("vals"))
      .withColumn("running", expr(
        "aggregate(vals, CAST(array() AS ARRAY<DOUBLE>), (acc, x) -> " +
          "concat(acc, array(CASE WHEN size(acc) = 0 THEN x " +
          "ELSE 0.2D * x + 0.8D * element_at(acc, -1) END)))"))
      .select(col("user_id"), posexplode_outer(expr("arrays_zip(vals, running)")))
      .where(col("col").isNotNull)
      .select(col("user_id"), (col("pos") + 1).as("rn"),
        col("col.vals").as("value"), round(col("col.running"), 6).as("ewma"))
      .orderBy("user_id", "rn")
  }

  val q108Sql: String =
    """WITH RECURSIVE seq AS (
      |  SELECT user_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events WHERE user_id < 40),
      |capped AS (SELECT * FROM seq WHERE rn <= 60),
      |ew AS (
      |  SELECT user_id, rn, value, value AS ewma FROM capped WHERE rn = 1
      |  UNION ALL
      |  SELECT c.user_id, c.rn, c.value,
      |    CAST(0.2 AS DOUBLE) * c.value + CAST(0.8 AS DOUBLE) * e.ewma
      |  FROM ew e JOIN capped c
      |    ON c.user_id = e.user_id AND c.rn = e.rn + 1)
      |SELECT user_id, rn, value, ROUND(ewma, 6) AS ewma
      |FROM ew ORDER BY user_id, rn""".stripMargin

  // ---------------------------------------------------------------- q109
  // z-score outlier detection per event type. The moments pass is decimal-
  // routed (factors cast to DECIMAL(18,6) BEFORE the product, sums exact
  // and order-insensitive), so mean/std are bit-identical cross-engine;
  // the per-row z and the |z| > 2 verdict are then pure double arithmetic
  // on identical inputs. Two scans + one broadcast join of a 6-row stats
  // table — the shape survives any fact-side scale.
  def q109Outliers(s: SparkSession, d: String): DataFrame = {
    val vdec = col("value").cast(DecimalType(18, 6))
    val mom = Tables.events(s, d).groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(vdec).cast("double").as("s"),
        sum(vdec * vdec).cast("double").as("ss"))
      .withColumn("mean", col("s") / col("n"))
      .withColumn("std",
        sqrt((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1)))
      .select("event_type", "mean", "std")
    Tables.events(s, d).select("event_type", "value")
      .join(broadcast(mom), Seq("event_type"))
      .withColumn("z", (col("value") - col("mean")) / col("std"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(max("mean"), 6).as("mean"),
        round(max("std"), 6).as("std"),
        count(when(abs(col("z")) > 2.0, 1)).as("n_outliers"),
        round(max(abs(col("z"))), 6).as("max_abs_z"))
      .orderBy("event_type")
  }

  val q109Sql: String =
    """WITH m AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
      |    CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
      |      AS DOUBLE) AS ss
      |  FROM events GROUP BY 1),
      |st AS (
      |  SELECT event_type, s / n AS mean,
      |    sqrt((ss - s * s / n) / (n - 1)) AS std
      |  FROM m),
      |z AS (
      |  SELECT e.event_type, st.mean, st.std,
      |    (e.value - st.mean) / st.std AS z
      |  FROM events e JOIN st ON st.event_type = e.event_type)
      |SELECT event_type, COUNT(*) AS n, ROUND(MAX(mean), 6) AS mean,
      |  ROUND(MAX(std), 6) AS std,
      |  COUNT(CASE WHEN ABS(z) > 2.0 THEN 1 END) AS n_outliers,
      |  ROUND(MAX(ABS(z)), 6) AS max_abs_z
      |FROM z GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q110
  // Z-order (Morton) clustering keys: interleave (customer, order-day)
  // into one sort key whose order is local in BOTH dimensions — sorting a
  // table by zorder16 before writing makes every parquet row group's
  // min/max tight on every interleaved column, so 2-D range predicates
  // prune files that a 1-D sort could never skip. The custom codegen
  // expression is the layout key; the query audits bucket occupancy and
  // per-bucket dimension ranges (the data-skipping width the layout buys).
  def q110Zorder(s: SparkSession, d: String): DataFrame = {
    val day = datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
    Tables.orders(s, d)
      .select(col("o_custkey"), day.as("epoch_day"))
      .withColumn("z", matching.zorder16(
        pmod(col("o_custkey"), lit(65536L)), pmod(col("epoch_day"), lit(65536L))))
      .groupBy(shiftright(col("z"), 12).as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min("o_custkey").as("c_lo"), max("o_custkey").as("c_hi"),
        min("epoch_day").as("d_lo"), max("epoch_day").as("d_hi"))
      .orderBy("z_bucket")
  }

  val q110Sql: String =
    """WITH zv AS (
      |  SELECT o_custkey,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS epoch_day,
      |    CAST(list_sum(list_transform(range(0, 16), i ->
      |      ((((o_custkey % 65536) >> i) & 1) << (2 * i)) +
      |      ((((date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |          % 65536) >> i) & 1) << (2 * i + 1)))) AS BIGINT) AS z
      |  FROM orders)
      |SELECT z >> 12 AS z_bucket, COUNT(*) AS n,
      |  MIN(o_custkey) AS c_lo, MAX(o_custkey) AS c_hi,
      |  MIN(epoch_day) AS d_lo, MAX(epoch_day) AS d_hi
      |FROM zv GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q111
  // PageRank to 5 full iterations over q98's deterministic out-degree-2
  // link graph — the converged extension of q98's single step. Each round
  // is one equi-join (edges ⋈ ranks on src) + one aggregate keyed by dst +
  // one left join back to the vertex set; `Lineage.cut` per round caps
  // the plan (without it the lineage doubles per iteration and analysis
  // hangs — the q71 rule); the cut is executor-memory localCheckpoint by
  // default, reliable checkpoint() when spark.graft.checkpoint.dir is
  // set (the fault-tolerant cluster posture). Per-round contribution sums are
  // decimal-routed (rank/2 is an EXACT double halving, then quantized to
  // DECIMAL(20,12) before the order-insensitive exact SUM), so five
  // iterations stay bit-reproducible against the oracle's five chained
  // CTE blocks.
  def q111PageRank(s: SparkSession, d: String): DataFrame = {
    val n = Tables.documents(s, d).select(count(lit(1)).as("n"))
    val edges = Tables.documents(s, d).select(col("doc_id"))
      .crossJoin(broadcast(n))
      .select(col("doc_id").as("src"),
        explode_outer(array((col("doc_id") * 7 + 13) % col("n"),
          (col("doc_id") * 13 + 7) % col("n"))).as("dst"))
    // edges/verts are read in EVERY round — no chain, never deleted; the
    // ranks variable is re-assigned per round — chain it so reliable mode
    // drops round k-1's checkpoint dir once round k is on disk
    def cut(df: DataFrame) = graft.operators.Lineage.cut(df)
    // per-invocation chain id — see Clusters.connectedComponents
    val chain = s"q111_ranks@${java.util.UUID.randomUUID()}"
    def cutRanks(df: DataFrame) =
      graft.operators.Lineage.cut(df, chain = chain)
    val cutEdges = cut(edges)
    val verts = cut(Tables.documents(s, d).select(col("doc_id")))
    var ranks = cutRanks(verts.select(col("doc_id"), lit(1.0).as("rank")))
    for (_ <- 1 to 5) {
      val contribs = cutEdges
        .join(ranks.withColumnRenamed("doc_id", "src_id"), col("src") === col("src_id"))
        .select(col("dst"), (col("rank") / 2).cast(DecimalType(20, 12)).as("c"))
        .groupBy("dst").agg(sum(col("c")).as("csum"))
      ranks = cutRanks(verts.join(contribs, verts("doc_id") === contribs("dst"), "left")
        .select(col("doc_id"),
          (lit(0.15) + lit(0.85) *
            coalesce(col("csum").cast("double"), lit(0.0))).as("rank")))
    }
    // loop done: drop the chain's bookkeeping entry (final dir stays —
    // `ranks` is still backed by it)
    graft.operators.Lineage.endChain(ranks, chain)
    ranks.select(col("doc_id"), round(col("rank"), 9).as("rank")).orderBy("doc_id")
  }

  val q111Sql: String = {
    val iters = (1 to 5).map { i =>
      s"""r$i AS (
         |  SELECT d.doc_id,
         |    0.15 + 0.85 * COALESCE(CAST(c.s AS DOUBLE), 0.0) AS rank
         |  FROM documents d LEFT JOIN (
         |    SELECT e.dst, SUM(CAST(r.rank / 2 AS DECIMAL(20,12))) AS s
         |    FROM e JOIN r${i - 1} r ON r.doc_id = e.src GROUP BY e.dst) c
         |    ON c.dst = d.doc_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH n AS (SELECT COUNT(*) AS n FROM documents),
       |e AS (
       |  SELECT doc_id AS src, (doc_id * 7 + 13) % n.n AS dst
       |  FROM documents CROSS JOIN n
       |  UNION ALL
       |  SELECT doc_id, (doc_id * 13 + 7) % n.n FROM documents CROSS JOIN n),
       |r0 AS (SELECT doc_id, CAST(1.0 AS DOUBLE) AS rank FROM documents),
       |$iters
       |SELECT doc_id, ROUND(rank, 9) AS rank FROM r5 ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q112
  // Reproducible hash-weighted sampling: each document's keep-probability
  // is proportional to its length (capped at 1), and the coin flip is the
  // md5-derived uniform u = (md5_lower64(key) >>> 11) / 2^53 — a pure
  // function of the stable doc_id, so the sample is identical on every
  // run, every engine, every partitioning (the property grid-search and
  // ablation pipelines need: no RNG state, no seed plumbing, no
  // repartition sensitivity). Zero shuffles before the per-source audit
  // aggregate.
  def q112WeightedSample(s: SparkSession, d: String): DataFrame = {
    val u = shiftrightunsigned(
      matching.md5_lower64(concat(col("doc_id").cast("string"), lit(":ws"))), 11)
      .cast("double") / lit(9007199254740992.0)
    Tables.documents(s, d)
      .withColumn("u", u)
      .withColumn("p", least(lit(1.0), col("n_chars") / lit(400.0)))
      .where(col("u") < col("p"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("chars_kept"),
        min("doc_id").as("first_doc"))
      .orderBy("source")
  }

  val q112Sql: String =
    """WITH sampled AS (
      |  SELECT doc_id, source, n_chars,
      |    CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || ':ws') >> 11 AS DOUBLE)
      |      / 9007199254740992.0 AS u,
      |    LEAST(1.0, n_chars / 400.0) AS p
      |  FROM documents)
      |SELECT source, COUNT(*) AS n_kept,
      |  CAST(SUM(n_chars) AS BIGINT) AS chars_kept, MIN(doc_id) AS first_doc
      |FROM sampled WHERE u < p GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q113
  // 2-D skyline (Pareto frontier): parts no other part dominates on
  // (cheaper-or-equal price, larger-or-equal size, strictly better in
  // one). The naive form is an O(n²) self-join; the scale path here
  // reduces first (max size per DISTINCT price — one shuffle), then runs
  // the running-max frontier scan over the distinct-price set as a
  // PARTITIONED two-pass prefix-max (operators.Scan: range-partition on
  // price → per-partition prefix → tiny carry-in combine broadcast
  // back), so no single task ever holds the whole distinct-price set.
  // The oracle is the quadratic NOT EXISTS dominance definition itself.
  def q113Skyline(s: SparkSession, d: String): DataFrame = {
    val g = Tables.part(s, d).groupBy("p_retailprice")
      .agg(max("p_size").as("gmax"))
    val frontier = graft.operators.Scan
      .withRunningMax(g, Seq(col("p_retailprice")), col("gmax"), "prev_max")
      .where(col("gmax") > coalesce(col("prev_max"), lit(Int.MinValue)))
      .select("p_retailprice", "gmax")
    Tables.part(s, d) // independent read for the join back
      .join(frontier, Seq("p_retailprice"))
      .where(col("p_size") === col("gmax"))
      .select("p_partkey", "p_retailprice", "p_size")
      .orderBy("p_retailprice", "p_partkey")
  }

  val q113Sql: String =
    """SELECT p_partkey, p_retailprice, p_size
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      |ORDER BY p_retailprice, p_partkey""".stripMargin

  // ---------------------------------------------------------------- q114
  // k-anonymity audit over quasi-identifiers (nation, account-balance
  // band, market segment): the equivalence-class size per QI combination
  // is THE privacy metric a release gate checks (k ≥ 5 here). One
  // hash-aggregate on the generalized keys — the generalization (banding)
  // is a narrow map, so the audit costs one shuffle at any scale.
  def q114Kanon(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d)
      .select(col("c_nationkey"),
        floor(col("c_acctbal") / lit(1000.0)).as("bal_band"),
        col("c_mktsegment"))
      .groupBy("c_nationkey", "bal_band", "c_mktsegment")
      .agg(count(lit(1)).as("n"))
      .withColumn("is_k_anon", col("n") >= 5)
      .orderBy("c_nationkey", "bal_band", "c_mktsegment")
  }

  val q114Sql: String =
    """SELECT c_nationkey, CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
      |  c_mktsegment, COUNT(*) AS n, COUNT(*) >= 5 AS is_k_anon
      |FROM customer GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- q115
  // Jaro-Winkler record matching over deterministic document pairs — the
  // custom codegen expression (bitwise-matched to DuckDB's
  // jaro_winkler_similarity over a 3k-pair fuzz) scoring an equi-keyed
  // candidate join. The pairing IS the scale story: fuzzy matching at
  // 100 TB is always blocked-then-scored (q100's pattern); the scorer here
  // is the expensive-kernel half, kept inside whole-stage codegen, scoring
  // only equi-join survivors — never a cross join.
  def q115JaroWinkler(s: SparkSession, d: String): DataFrame = {
    val a = Tables.documents(s, d)
      .select(col("doc_id").as("id_a"), substring(col("text"), 1, 80).as("ta"))
    val b = Tables.documents(s, d)
      .select(col("doc_id").as("id_b"), substring(col("text"), 1, 80).as("tb"))
    a.join(b, col("id_b") === col("id_a") + lit(250L))
      .select(col("id_a").as("doc_id"),
        round(matching.jaro_winkler(col("ta"), col("tb")), 6).as("jw"))
      .where(col("jw") >= 0.5)
      .orderBy("doc_id")
  }

  val q115Sql: String =
    """WITH scored AS (
      |  SELECT a.doc_id,
      |    ROUND(jaro_winkler_similarity(
      |      substr(a.text, 1, 80), substr(b.text, 1, 80)), 6) AS jw
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 250)
      |SELECT doc_id, jw FROM scored WHERE jw >= 0.5 ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q222
  // k-CORE decomposition (k = 4) by iterative peeling over a
  // deterministic MIXED-generator link graph (one affine map + two
  // QUADRATIC maps — quadratics are not bijections mod n, so in-degrees
  // vary and the peel actually cascades; the affine-only q111 graph is
  // a union of permutations whose degrees are all 5-6, making every
  // core trivial — measured before choosing): per round, drop every vertex
  // whose degree in the CURRENT subgraph is < k together with its
  // incident edges, until the edge set is stable — the surviving
  // subgraph is the k-core (every member has >= CoreK neighbors INSIDE
  // it; CoreK = 4 here),
  // the standard graph-mining density primitive. State is the
  // DIRECTED-DOUBLED edge list (each undirected edge as both
  // orientations), which makes a peel round ONE window pass — deg(x) =
  // COUNT over (partition by first col), deg(y) over the second — and
  // lets the DuckDB oracle express the SAME iteration as a recursive
  // CTE with a single self-reference. Convergence is exact via edge
  // COUNT equality (the set only shrinks: equal cardinality ⇔ fixed
  // point), and the loop REQUIREs convergence within the shared round
  // cap so an unconverged run fails loudly in both engines rather than
  // diverging silently. Expander-shaped graph ⇒ few rounds (the
  // CC-lesson applied up front: peeling a path graph would be
  // O(n) rounds — the graph, not the operator, owns that bound).
  private val CoreK = 4
  private val CoreRounds = 60

  def q222KCore(s: SparkSession, d: String): DataFrame = {
    val n = Tables.documents(s, d).select(count(lit(1)).as("n"))
    val raw = Tables.documents(s, d).select(col("doc_id"))
      .crossJoin(broadcast(n))
      // reduce mod n BEFORE multiplying: a raw doc_id² overflows Long at
      // the MakeScale SFs (disjoint keyspaces sit at huge offsets), and
      // Spark ANSI raises where DuckDB's HUGEINT would not — the
      // documented reduce-first rule keeps both engines in exact-Long
      // range ((n-1)²·3 for any realistic corpus)
      .withColumn("m", col("doc_id") % col("n"))
      .select(col("m").as("src"),
        explode_outer(array(
          (col("m") * 7 + 13) % col("n"),
          (col("m") * col("m") + 1) % col("n"),
          (col("m") * col("m") * 3 + 11) % col("n"))).as("dst"))
    val undirected = raw
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    def cut(df: DataFrame) = graft.operators.Lineage.cut(df)
    val chain = s"q222_core@${java.util.UUID.randomUUID()}"
    def cutEs(df: DataFrame) =
      graft.operators.Lineage.cut(df, chain = chain)
    var es = cutEs(undirected
      .select(col("u").as("x"), col("v").as("y"))
      .unionAll(undirected.select(col("v").as("x"), col("u").as("y"))))
    var esCount = es.count()
    var converged = esCount == 0L
    var i = 0
    while (i < CoreRounds && !converged) {
      val wx = org.apache.spark.sql.expressions.Window.partitionBy("x")
      val wy = org.apache.spark.sql.expressions.Window.partitionBy("y")
      // the cut EVALUATES the round before the chain reclaims the
      // previous one, and the count probe below reads only the NEW set
      val next = cutEs(es
        .withColumn("dx", count(lit(1)).over(wx))
        .withColumn("dy", count(lit(1)).over(wy))
        .filter(col("dx") >= CoreK && col("dy") >= CoreK)
        .select("x", "y"))
      val nextCount = next.count()
      converged = nextCount == esCount
      es = next
      esCount = nextCount
      i += 1
    }
    require(converged,
      s"q222: $CoreK-core peel did not converge within $CoreRounds rounds")
    graft.operators.Lineage.endChain(es, chain)
    es.groupBy(col("x").as("doc_id"))
      .agg(count(lit(1)).as("core_degree"))
      .orderBy("doc_id")
  }

  val q222Sql: String = {
    s"""WITH RECURSIVE
       |n AS (SELECT COUNT(*) AS n FROM documents),
       |e0 AS (
       |  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
       |  FROM (
       |    SELECT doc_id % n.n AS src,
       |      ((doc_id % n.n) * 7 + 13) % n.n AS dst
       |    FROM documents CROSS JOIN n
       |    UNION ALL
       |    SELECT doc_id % n.n, ((doc_id % n.n) * (doc_id % n.n) + 1) % n.n
       |    FROM documents CROSS JOIN n
       |    UNION ALL
       |    SELECT doc_id % n.n,
       |      ((doc_id % n.n) * (doc_id % n.n) * 3 + 11) % n.n
       |    FROM documents CROSS JOIN n)
       |  WHERE src <> dst),
       |peel AS (
       |  SELECT x, y, 0 AS r FROM (
       |    SELECT u AS x, v AS y FROM e0
       |    UNION ALL SELECT v, u FROM e0)
       |  UNION ALL
       |  SELECT x, y, r + 1 FROM (
       |    SELECT x, y, r,
       |      COUNT(*) OVER (PARTITION BY x) AS dx,
       |      COUNT(*) OVER (PARTITION BY y) AS dy
       |    FROM peel)
       |  WHERE dx >= $CoreK AND dy >= $CoreK AND r < $CoreRounds)
       |SELECT x AS doc_id, COUNT(*) AS core_degree
       |FROM peel WHERE r = $CoreRounds
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q222_kcore"           -> (q222KCore _),
    "q106_topk_agg"        -> (q106TopkAgg _),
    "q107_chunk_dedup"     -> (q107ChunkDedup _),
    "q108_ewma"            -> (q108Ewma _),
    "q109_outliers"        -> (q109Outliers _),
    "q110_zorder"          -> (q110Zorder _),
    "q111_pagerank"        -> (q111PageRank _),
    "q112_weighted_sample" -> (q112WeightedSample _),
    "q113_skyline"         -> (q113Skyline _),
    "q114_kanon"           -> (q114Kanon _),
    "q115_jaro_winkler"    -> (q115JaroWinkler _))

  val oracles: Map[String, String] = Map(
    "q222_kcore"           -> q222Sql,
    "q106_topk_agg"        -> q106Sql,
    "q107_chunk_dedup"     -> q107Sql,
    "q108_ewma"            -> q108Sql,
    "q109_outliers"        -> q109Sql,
    "q110_zorder"          -> q110Sql,
    "q111_pagerank"        -> q111Sql,
    "q112_weighted_sample" -> q112Sql,
    "q113_skyline"         -> q113Sql,
    "q114_kanon"           -> q114Sql,
    "q115_jaro_winkler"    -> q115Sql)
}
