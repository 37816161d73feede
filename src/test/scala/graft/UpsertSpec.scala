package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Upsert

class UpsertSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("mergeByKey: updates replace, inserts append, others untouched") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val updates = Seq((2L, "b2", 22.0), (9L, "new", 90.0)).toDF("k", "name", "v")
    val merged = Upsert.mergeByKey(base, updates, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(merged.toSeq == Seq(
      (1L, "a", 10.0), (2L, "b2", 22.0), (3L, "c", 30.0), (9L, "new", 90.0)))
  }

  test("upsertParquet: staged swap publishes merged table atomically") {
    val dir = Files.createTempDirectory("graft_upsert").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/nation"
    Tables.nation(spark, sf).write.parquet(path)
    val updates = Tables.nation(spark, sf)
      .filter(col("n_nationkey") < 3)
      .withColumn("n_name", upper(col("n_name")))
      .unionByName(Tables.nation(spark, sf).filter(col("n_nationkey") === 0)
        .withColumn("n_nationkey", lit(999)))
    val n = Upsert.upsertParquet(spark, path, updates, Seq("n_nationkey"))
    assert(n == 26) // 25 originals (3 updated in place) + 1 insert
    val after = spark.read.parquet(path)
    assert(after.count() == 26)
    assert(after.filter(col("n_nationkey") === 999).count() == 1)
    // updated rows carry the new value, no duplicate keys survive
    assert(after.filter(col("n_nationkey") < 3)
      .select("n_name").collect().forall(r => r.getString(0) == r.getString(0).toUpperCase))
    assert(after.groupBy("n_nationkey").count().filter(col("count") > 1).count() == 0)
    // no staged/retired leftovers
    assert(!new java.io.File(path + ".staged").exists())
    assert(!new java.io.File(path + ".retired").exists())
  }

  test("streaming foreachBatch drives incremental upsert (CDC sink pattern)") {
    // The production incremental-materialization shape: a stream lands
    // micro-batches through foreachBatch -> MERGE into a keyed parquet
    // table. Replaying the bounded event stream must leave the table at
    // exactly the batch-computed latest-per-user snapshot — streaming
    // ingestion and batch backfill converging on one state is what makes
    // the pattern operable.
    import org.apache.spark.sql.expressions.Window
    val dir = Files.createTempDirectory("graft_stream_upsert").toFile
    dir.deleteOnExit()
    val path = s"${dir.getAbsolutePath}/latest_by_user"
    // seed: an empty-but-typed snapshot (user_id, ts, value)
    Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value"))
      .filter(lit(false))
      .write.parquet(path)
    val q = graft.streaming.EventsStream.readEvents(spark, sf)
      .select(col("user_id"), col("ts"), col("value"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // per-batch latest row per user, merged on the key
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("value"))
        val latest = batch.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn")
        Upsert.upsertParquet(latest.sparkSession, path, latest, Seq("user_id"))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.read.parquet(path)
      .orderBy("user_id").collect().toSeq
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("value"))
    val batchTwin = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("user_id").collect().toSeq
    assert(streamed == batchTwin)
  }
}
