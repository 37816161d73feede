package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{durations, DurationKernel}

class EngineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("duration_ms parses racing time formats; lexicographic bug fixed") {
    assert(DurationKernel.parse("1:34.015") == 94015L)
    assert(DurationKernel.parse("1:32:03.897") == 5523897L)
    assert(DurationKernel.parse("23.5") == 23500L)
    assert(DurationKernel.parse("23") == 23000L)
    assert(DurationKernel.parse("1:02.5") == 62500L) // 2-frac pad
    assert(DurationKernel.parse("") == -1L)
    assert(DurationKernel.parse("abc") == -1L)
    assert(DurationKernel.parse("1:75.0") == -1L) // seconds > 59
    // the Q4 landmine: lexicographic says "1:59.9" > "10:00.0"
    assert("1:59.9" > "10:00.0") // string compare is wrong
    assert(DurationKernel.parse("1:59.9") < DurationKernel.parse("10:00.0"))
  }

  test("duration_ms as Column: null for malformed, correct ordering") {
    import spark.implicits._
    val df = Seq("1:34.015", "59.9", "bogus", "2:01.000")
      .toDF("t").select(col("t"), durations.duration_ms(col("t")).as("ms"))
    val got = df.collect().map(r => (r.getString(0), if (r.isNullAt(1)) -1 else r.getLong(1))).toMap
    assert(got("1:34.015") == 94015L && got("bogus") == -1 && got("59.9") == 59900L)
  }

  test("SQL surface: custom functions callable after registration") {
    import spark.implicits._
    Engine.registerFunctions(spark)
    Seq(("a b c", "a b d")).toDF("x", "y").createOrReplaceTempView("t")
    val row = spark.sql(
      """SELECT hamming64(simhash64(x), simhash64(y)) AS hd,
        |  duration_ms('1:30.000') AS ms,
        |  size(minhash_signature(x, 2, 16)) AS sig_len FROM t""".stripMargin)
      .collect().head
    assert(row.getAs[Long]("ms") == 90000L)
    assert(row.getAs[Int]("sig_len") == 16)
    assert(row.getAs[Int]("hd") >= 0)
    // generator functions work through SQL too (Generate planted)
    val chunks = spark.sql(
      "SELECT chunk_tokens('a b c d e', 2, 2) FROM t").collect()
    assert(chunks.length == 3) // [a b], [c d], [e]
    // aggregates too: topk_by group-aggregates through the same registry,
    // and the explicit input casts widen INT score / INT key (the buffer
    // is (double, long) — without the casts this is a runtime CCE)
    Seq((1, 10, 100), (1, 30, 101), (1, 20, 102), (2, 5, 200))
      .toDF("g", "s", "k").createOrReplaceTempView("tk")
    val top = spark.sql(
      """SELECT g, topk_by(s, k, 2) AS top FROM tk GROUP BY g ORDER BY g""")
      .collect()
    assert(top.length == 2)
    val g1 = top(0).getSeq[org.apache.spark.sql.Row](1)
    assert(g1.map(r => (r.getDouble(0), r.getLong(1))) ==
      Seq((30.0, 101L), (20.0, 102L)))
    assert(top(1).getSeq[org.apache.spark.sql.Row](1).size == 1)
  }

  test("GraftExtensions injects functions at session build time") {
    // cloned session via newSession shares the registry injected by
    // extensions; here we at least verify the extensions object wires up
    val e = new GraftExtensions
    // builder-level injection is exercised through Engine.session in
    // environments that allow a second context; on a shared test JVM we
    // verify the function list is complete instead
    assert(Engine.functions.map(_._1).toSet == Set(
      "simhash64", "simhash_md5", "minhash_signature",
      "rolling_fingerprint", "winnow_md5", "word_ngrams", "char_shingles",
      "char_shingles_md5",
      "shingle_hashes", "lang_scores", "dhash64", "hamming64", "cosine_similarity",
      "dot_product", "duration_ms", "chunk_tokens",
      "strip_accents", "nfc_normalize",
      "jaro_winkler", "zorder16", "zorder_n", "hilbert_n", "md5_lower64",
      "topk_by", "cms_sketch"))
    assert(e != null)
  }

  test("approx aggregates track exact values") {
    // q19 emits per-group tolerance verdicts (approx vs exact in-engine);
    // every verdict must hold
    val rows = graft.queries.Relational.q19Approx(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("card_within_5pct"),
        s"HLL cardinality off by >5% for ${r.getAs[String]("l_returnflag")}")
      assert(r.getAs[Boolean]("p50_within_5pct"),
        s"approx_percentile off by >5% for ${r.getAs[String]("l_returnflag")}")
    }
  }

  test("driver contract: entry returns rows; every query has a fn") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.queries.size == 235)
    // since round 4 the oracle surface is TOTAL: every query has a twin
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  test("custom expressions run inside whole-stage codegen") {
    import graft.functions.text
    val plan = Tables.documents(spark, sf)
      .select(text.simhash64(col("text")).as("sh"),
        text.minhash_signature(col("text")).as("sig"))
      .queryExecution.executedPlan.toString
    // the '*(n)' prefix marks operators fused into a WholeStageCodegen
    // stage; our doGenCode expressions must not break the fusion
    val projectLine = plan.linesIterator
      .find(_.contains("simhash64")).getOrElse(fail(s"no simhash in:\n$plan"))
    assert(projectLine.trim.startsWith("*"), s"not codegen'd:\n$plan")
  }

  test("managed-table sink and DDL lifecycle (S8/S9)") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assert(wh != null)
    spark.sql("CREATE DATABASE IF NOT EXISTS silver_test")
    Tables.nation(spark, sf).write.mode("overwrite")
      .format("parquet").saveAsTable("silver_test.nation")
    assert(spark.table("silver_test.nation").count() == 25)
    spark.sql("DROP TABLE IF EXISTS silver_test.nation_ctas")
    spark.sql(
      """CREATE TABLE silver_test.nation_ctas USING parquet AS
        |SELECT n_nationkey, n_name FROM silver_test.nation
        |WHERE n_nationkey < 5""".stripMargin)
    assert(spark.table("silver_test.nation_ctas").count() == 5)
    spark.sql("DROP TABLE silver_test.nation_ctas")
    spark.sql("DROP TABLE silver_test.nation")
    spark.sql("DROP DATABASE silver_test")
  }
}
