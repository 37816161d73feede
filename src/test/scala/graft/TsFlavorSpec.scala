package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The events-ts canary (VERDICT r10 task 7): `Tables.normalizeTs` must
  * handle every storage flavor that has actually shipped and THROW an
  * explicit "new events ts flavor" error on anything else — the r9
  * testdata regeneration (nanos int64 → micros TIMESTAMP_NTZ) broke all
  * 14 events queries at once with cryptic downstream errors; a third
  * flavor must fail loudly at the choke point instead.
  */
class TsFlavorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val us = 1_700_000_000_000_000L // a fixed instant, micros

  test("known flavor: int64 nanos normalizes by integral DIV") {
    val df = Seq(us * 1000L + 999L).toDF("ts") // nanos, sub-us dropped
    val got = Tables.normalizeTs(df)
      .select(unix_micros(col("ts"))).as[Long].head()
    assert(got == us)
  }

  test("known flavor: TIMESTAMP_NTZ micros casts to session-TZ timestamp") {
    val df = Seq(us).toDF("us")
      .select(timestamp_micros(col("us"))
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType)
    val got = Tables.normalizeTs(df)
    assert(got.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // sessions run UTC, so the instant is preserved exactly
    assert(got.select(unix_micros(col("ts"))).as[Long].head() == us)
  }

  test("known flavor: session-TZ timestamp passes through untouched") {
    val df = Seq(us).toDF("us").select(timestamp_micros(col("us")).as("ts"))
    assert(Tables.normalizeTs(df)
      .select(unix_micros(col("ts"))).as[Long].head() == us)
  }

  test("unknown flavor throws the explicit canary message") {
    val df = Seq("2024-01-01 00:00:00").toDF("ts") // a STRING ts
    val e = intercept[IllegalStateException](Tables.normalizeTs(df))
    assert(e.getMessage.contains("new events ts flavor"))
    assert(e.getMessage.contains("StringType"))
  }

  test("footer canary: the shipped testdata passes; a bare-int64 ts fails") {
    // whatever flavor the current generation uses must be accepted
    Tables.assertEventsTsFlavor(spark, "/root/testdata/sf0.001/events.parquet")
    // a regenerated file storing ts as an UNANNOTATED BIGINT is exactly
    // the case Spark-level types cannot distinguish from nanos (both
    // read LongType under nanosAsLong) — the footer probe must refuse it
    val dir = java.nio.file.Files.createTempDirectory("graft_tsflavor_")
    try {
      val p = s"$dir/events.parquet"
      Seq((1L, us)).toDF("user_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(p)
      val e = intercept[IllegalStateException](
        Tables.assertEventsTsFlavor(spark, p))
      assert(e.getMessage.contains("new events ts flavor"))
    } finally graft.streaming.Replay.deleteRecursively(dir)
  }
}
