package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{matching, topk, MatchKernels}
import graft.queries.Advanced

/** Semantic invariants for the round-5 batch (q106-q115) beyond the
  * DuckDB oracle gate: kernel golden values, heap-aggregate vs window
  * equivalence across partitionings, dedup/skyline/PageRank properties,
  * and the EWMA recurrence recomputed independently.
  */
class AdvancedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("jaro-winkler kernel matches the published golden values") {
    // classic literature pairs + DuckDB-verified edge semantics
    assert(MatchKernels.jaroWinkler("martha", "marhta") == 0.9611111111111111)
    assert(MatchKernels.jaroWinkler("dwayne", "duane") == 0.8400000000000001)
    assert(MatchKernels.jaroWinkler("", "") == 0.0, "both-empty is 0, not 1")
    assert(MatchKernels.jaroWinkler("a", "") == 0.0)
    assert(MatchKernels.jaroWinkler("ab", "ab") == 1.0)
    // below the 0.7 boost threshold the common prefix must NOT be applied
    assert(MatchKernels.jaroWinkler("aXXXXXXX", "aYYYYYYY") == 0.4166666666666667)
    // prefix bonus caps at 4 even for longer shared prefixes
    assert(MatchKernels.jaroWinkler("spark table scan", "spark table join") == 0.925)
  }

  test("zorder16 interleaves bits: x on even positions, y on odd") {
    assert(MatchKernels.zorder16(0xffffL, 0L) == 0x55555555L)
    assert(MatchKernels.zorder16(0L, 0xffffL) == 0xaaaaaaaaL)
    assert(MatchKernels.zorder16(0xffffL, 0xffffL) == 0xffffffffL)
    assert(MatchKernels.zorder16(0L, 0L) == 0L)
    // deinterleave round-trip over a sample grid
    def compact(z0: Long): Long = {
      var z = z0 & 0x55555555L
      z = (z | (z >> 1)) & 0x33333333L
      z = (z | (z >> 2)) & 0x0f0f0f0fL
      z = (z | (z >> 4)) & 0x00ff00ffL
      z = (z | (z >> 8)) & 0x0000ffffL
      z
    }
    for (x <- Seq(0L, 1L, 255L, 4096L, 65535L); y <- Seq(0L, 7L, 1024L, 65535L)) {
      val z = MatchKernels.zorder16(x, y)
      assert(compact(z) == x && compact(z >> 1) == y, s"round-trip ($x,$y)")
    }
  }

  test("zorderN: bit i of dim d lands at i*n+d; sign bit clear; 2-D " +
      "restriction agrees with a naive interleave") {
    // n=3 → 21 bits per dim: all-ones in one dim lights every 3rd bit
    val ones21 = (1L << 21) - 1L
    def expect3(d: Int): Long =
      (0 until 21).map(i => 1L << (i * 3 + d)).reduce(_ | _)
    assert(MatchKernels.zorderN(Array(ones21, 0L, 0L)) == expect3(0))
    assert(MatchKernels.zorderN(Array(0L, ones21, 0L)) == expect3(1))
    assert(MatchKernels.zorderN(Array(0L, 0L, ones21)) == expect3(2))
    // naive reference over random tuples for n = 2, 3, 4 — and the sign
    // bit must stay clear (signed sort order == unsigned Morton order)
    def naive(xs: Array[Long]): Long = {
      val n = xs.length; val b = 63 / n
      var out = 0L
      for (d <- 0 until n; i <- 0 until b)
        out |= (((xs(d) & ((1L << b) - 1)) >>> i) & 1L) << (i * n + d)
      out
    }
    val rnd = new scala.util.Random(42)
    for (n <- 2 to 4; _ <- 1 to 200) {
      val xs = Array.fill(n)(rnd.nextLong().abs)
      val z = MatchKernels.zorderN(xs)
      assert(z == naive(xs) && z >= 0L, s"n=$n ${xs.toSeq}")
    }
    // masking: values past the 63/n-bit budget wrap like zorder16's
    assert(MatchKernels.zorderN(Array(1L << 21, 0L, 0L)) == 0L)
  }

  test("hilbertN: exhaustive adjacency (consecutive indexes are L1 " +
      "neighbors), full-domain bijection at low order, round-trip at " +
      "full width") {
    // Adjacency is THE Hilbert property (Morton fails it at quadrant
    // seams) and it transfers to any prefix range [0, 2^(n*k)) because
    // the curve is self-similar — the first 2^(n*k) cells are visited
    // before any other. Exhaustive for n=2 (1024 cells) and n=3 (512).
    for ((n, domainBits) <- Seq((2, 10), (3, 9))) {
      val size = 1L << domainBits
      var prev = MatchKernels.hilbertInvN(0L, n)
      val seen = new Array[Boolean](size.toInt)
      seen(0) = true
      var h = 1L
      while (h < size) {
        val cur = MatchKernels.hilbertInvN(h, n)
        val l1 = (0 until n).map(d => math.abs(cur(d) - prev(d))).sum
        assert(l1 == 1, s"n=$n h=$h not adjacent: ${prev.toSeq}->${cur.toSeq}")
        // bijection: re-encoding the decoded point returns h exactly
        val back = MatchKernels.hilbertN(cur)
        assert(back == h, s"n=$n h=$h round-trip gave $back")
        assert(!seen(back.toInt), s"n=$n h=$h revisits a cell")
        seen(back.toInt) = true
        prev = cur
        h += 1
      }
    }
    // full-width round-trip: inv(enc(x)) == x masked, n = 2, 3, 4
    val rnd = new scala.util.Random(7)
    for (n <- 2 to 4; _ <- 1 to 200) {
      val b = 63 / n
      val xs = Array.fill(n)(rnd.nextLong() & ((1L << b) - 1L))
      val h = MatchKernels.hilbertN(xs)
      assert(h >= 0L, "sign bit must stay clear")
      assert(MatchKernels.hilbertInvN(h, n).toSeq == xs.toSeq, s"n=$n")
    }
  }

  test("zorder_n expression: codegen equals kernel; null dim nulls the " +
      "code; SQL-registered") {
    import spark.implicits._
    val df = Seq((5L, 9L, 130L), (0L, 0L, 0L), (2097151L, 1L, 77L))
      .toDF("x", "y", "z")
    val got = df.select(matching.zorder_n(col("x"), col("y"), col("z"))
      .as("m")).collect().map(_.getLong(0))
    val want = Seq((5L, 9L, 130L), (0L, 0L, 0L), (2097151L, 1L, 77L))
      .map(t => MatchKernels.zorderN(Array(t._1, t._2, t._3)))
    assert(got.toSeq == want)
    Engine.registerFunctions(spark)
    val viaSql = spark.sql("SELECT zorder_n(5, 9, 130) AS m")
      .collect().head.getLong(0)
    assert(viaSql == MatchKernels.zorderN(Array(5L, 9L, 130L)))
    // hilbert_n: same expression shape, Skilling kernel, same null rule
    val hGot = df.select(matching.hilbert_n(col("x"), col("y"), col("z"))
      .as("m")).collect().map(_.getLong(0))
    val hWant = Seq((5L, 9L, 130L), (0L, 0L, 0L), (2097151L, 1L, 77L))
      .map(t => MatchKernels.hilbertN(Array(t._1, t._2, t._3)))
    assert(hGot.toSeq == hWant)
    val hSql = spark.sql("SELECT hilbert_n(5, 9, 130) AS m")
      .collect().head.getLong(0)
    assert(hSql == MatchKernels.hilbertN(Array(5L, 9L, 130L)))
    val nulled = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
      .select(matching.zorder_n(col("a"), col("b")).as("m")).collect()
    assert(nulled.head.isNullAt(0))
  }

  test("topk_by equals the ROW_NUMBER window under any partitioning") {
    import spark.implicits._
    // adversarial: heavy score ties force the key tiebreak through both
    // the heap-evict path and the merge path (20 partitions → many
    // partial buffers per group)
    val rows = (1L to 2000L).map(i => (i % 7, (i % 13).toDouble, i))
    val df = rows.toDF("g", "score", "k").repartition(20)
    val viaAgg = df.groupBy("g")
      .agg(topk.topk_by(col("score"), col("k"), 5).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col.score").as("score"), col("col.key").as("k"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy(col("score").desc, col("k").asc)
    val viaWindow = df.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 5).select("g", "rank", "score", "k")
    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty,
      "heap aggregate must reproduce the window top-k exactly")
  }

  test("q107 chunk dedup: survivors are first occurrences, text reassembles") {
    val out = Advanced.q107ChunkDedup(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def chunksOf(t: String): Seq[String] =
      t.split(" ", -1).grouped(10).map(_.mkString(" ")).toSeq
    // global first occurrence per chunk text
    val firstSeen = scala.collection.mutable.Map[String, (Long, Int)]()
    docs.toSeq.sortBy(_._1).foreach { case (id, t) =>
      chunksOf(t).zipWithIndex.foreach { case (c, i) =>
        val key = (id, i)
        val cur = firstSeen.get(c)
        if (cur.isEmpty || (cur.get._1 * 100000 + cur.get._2) > id * 100000 + i)
          firstSeen(c) = key
      }
    }
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val kept = r.getAs[String]("new_text")
      val expected = chunksOf(docs(id)).zipWithIndex
        .filter { case (c, i) => firstSeen(c) == ((id, i)) }
        .map(_._1).mkString(" ")
      assert(kept == expected, s"doc $id reassembly")
    }
    // conservation: every chunk text survives exactly once corpus-wide
    val totalKept = out.map(_.getAs[Long]("n_kept")).sum
    assert(totalKept == firstSeen.size.toLong,
      "each distinct chunk survives exactly once")
  }

  test("q111 PageRank conserves total rank mass across iterations") {
    // out-degree is 2 for every vertex (no dangling mass), so each
    // iteration maps sum(r) = N to 0.15·N + 0.85·N = N
    val ranks = Advanced.q111PageRank(spark, sf).collect()
    val n = ranks.length.toDouble
    val mass = ranks.map(_.getAs[Double]("rank")).sum
    assert(math.abs(mass - n) < 1e-5, s"rank mass $mass drifted from $n")
    assert(ranks.forall(_.getAs[Double]("rank") >= 0.15))
  }

  test("q108 EWMA matches an independent sequential recomputation") {
    val out = Advanced.q108Ewma(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("rn").toLong) ->
        r.getAs[Double]("ewma")).toMap
    val events = Tables.events(spark, sf)
      .where(col("user_id") < 40)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[Double]("value")))
    events.groupBy(_._1).foreach { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._2.getTime, r._3)).take(60)
      var ewma = 0.0
      ordered.zipWithIndex.foreach { case ((_, _, _, v), i) =>
        ewma = if (i == 0) v else 0.2 * v + 0.8 * ewma
        val got = out((uid, (i + 1).toLong))
        assert(math.abs(got - BigDecimal(ewma).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
          s"user $uid rn ${i + 1}")
      }
    }
  }

  test("q113 skyline: kept points undominated, dropped points dominated") {
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dominated(p: (Long, Double, Int)): Boolean = parts.exists { q =>
      q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3)
    }
    val sky = Advanced.q113Skyline(spark, sf).collect()
      .map(_.getAs[Long]("p_partkey")).toSet
    parts.foreach { p =>
      assert(sky.contains(p._1) == !dominated(p),
        s"part ${p._1} skyline membership")
    }
  }

  test("q112 weighted sampling is reproducible and respects the cap") {
    val a = Advanced.q112WeightedSample(spark, sf).collect()
    val b = Advanced.q112WeightedSample(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)),
      "hash-derived sampling must be run-stable")
    // docs at/above the 400-char cap are kept with probability 1 — every
    // such doc must appear in the kept mass
    val df = spark.read.parquet(s"$sf/documents.parquet")
    val caps = df.where(col("n_chars") >= 400)
      .groupBy("source").agg(count(lit(1)).as("n_caps"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = a.map(r => r.getAs[String]("source") -> r.getAs[Long]("n_kept")).toMap
    caps.foreach { case (src, n) =>
      assert(kept.getOrElse(src, 0L) >= n, s"$src lost length-capped docs")
    }
  }

  test("jaro_winkler and zorder16 are SQL-registered") {
    Engine.registerFunctions(spark)
    val r = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS jw, zorder16(65535, 0) AS z, " +
        "md5_lower64('abc') AS h").head()
    assert(r.getAs[Double]("jw") == 0.9611111111111111)
    assert(r.getAs[Long]("z") == 0x55555555L)
    assert(r.getAs[Long]("h") == graft.functions.TextKernels.md5Lower("abc"))
  }
}
