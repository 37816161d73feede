package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.streaming.EventsStream

class MultimodalStreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("multimodal: decode stub is deterministic and schema is typed") {
    val m1 = Multimodal.decodeStub(1L, "hello".getBytes("UTF-8"))
    val m2 = Multimodal.decodeStub(1L, "hello".getBytes("UTF-8"))
    assert(m1 == m2)
    assert(m1.width >= 1 && m1.height >= 1 && m1.n_bytes == 5)
    val df = Multimodal.q30Multimodal(spark, sf)
    assert(df.schema.fieldNames.toSeq ==
      Seq("doc_id", "n_bytes", "format", "width", "height", "n_frames", "last_offset"))
    assert(df.count() == 500)
  }

  test("multimodal: a real decoder drops into extractMeta with an unchanged plan") {
    import spark.implicits._
    // planted PNG payloads: 8-byte signature + IHDR with known big-endian
    // dims — decodePngHeader is a REAL header parse, not a stub
    def png(w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(33)
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
        .foreach(x => b.put(x.toByte))
      b.putInt(13).put("IHDR".getBytes("US-ASCII"))
      b.putInt(w).putInt(h)
      Seq(8, 2, 0, 0, 0).foreach(x => b.put(x.toByte))
      b.array()
    }
    val planted = Seq((1L, png(640, 480)), (2L, png(13, 7)),
      (3L, "not a png".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val decoded = Multimodal.extractMeta(planted, Multimodal.decodePngHeader)
      .collect().map(m => m.doc_id -> m).toMap
    assert(decoded(1L).format == "png" &&
      decoded(1L).width == 640 && decoded(1L).height == 480)
    assert(decoded(2L).width == 13 && decoded(2L).height == 7)
    assert(decoded(3L).format == "unknown")
    // the seam claim: swapping the decoder changes NOTHING in the
    // physical plan — same node sequence over the same input (the
    // decoder only ever rides inside the one MapPartitions)
    val payloads = Multimodal.withPayload(spark, sf)
    def shape(d: org.apache.spark.sql.Dataset[_]): Seq[String] =
      d.queryExecution.executedPlan.collect { case p => p.getClass.getSimpleName }
    val stubShape = shape(Multimodal.extractMeta(payloads))
    val realShape = shape(Multimodal.extractMeta(payloads, Multimodal.decodePngHeader))
    assert(stubShape == realShape,
      s"decoder swap changed the plan: $stubShape vs $realShape")
    assert(stubShape.contains("MapPartitionsExec"),
      s"expected a partition-wise decode node in $stubShape")
  }

  test("multimodal: frame offsets are evenly spaced within payload") {
    import spark.implicits._
    val frames = Multimodal.frameSample(Multimodal.withPayload(spark, sf), 4)
    val bad = frames.filter(col("byte_offset") < 0 ||
      col("byte_offset") >= col("n_bytes")).count()
    assert(bad == 0)
    assert(frames.groupBy("doc_id").count().filter(col("count") =!= 4).count() == 0)
  }

  test("phash: dhash64 is stable, edit-local, and convention-exact") {
    import graft.functions.TextKernels
    val doc = ("the quick brown fox jumps over the lazy dog " * 3).trim
    val bytes = doc.getBytes("UTF-8")
    assert(TextKernels.dhash64(bytes) == TextKernels.dhash64(bytes.clone()))
    // first-byte edit perturbs block 0 only → at most bit 0 flips
    val edited = bytes.clone(); edited(0) = 'x'.toByte
    val ham = java.lang.Long.bitCount(
      TextKernels.dhash64(bytes) ^ TextKernels.dhash64(edited))
    assert(ham <= 1, s"first-byte edit flipped $ham bits")
    // payloads shorter than 65 bytes: empty blocks compare 0 > 0 = false
    // deterministically (no crash, stable value)
    val short = "abc".getBytes("UTF-8")
    assert(TextKernels.dhash64(short) == TextKernels.dhash64(short))
    assert(TextKernels.dhash64(Array.emptyByteArray) == 0L)
  }

  test("q152 phash near-dup: planted pairs recalled, output = brute force") {
    import graft.functions.TextKernels
    val got = Multimodal.q152PhashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // every planted copy (first byte replaced) is hamming ≤ 1 from its
    // original → must appear (banding recall is 1 by pigeonhole)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val planted = docs.filter(_._1 % 10 == 0)
    assert(planted.nonEmpty)
    planted.foreach { case (id, t) =>
      // a first-byte edit on a doc >= 65 bytes lands in block 0 alone
      // (<= 1 bit flips); below 65 bytes block 0 is empty and the edit
      // lands mid-block, where it can flip two ADJACENT difference bits
      // — so the per-pair bound is byte-length-dependent (r8 ADVICE),
      // while q152's own threshold (<= 3) recalls the pair either way
      val bound = if (t.getBytes("UTF-8").length < 65) 2 else 1
      assert(got.exists(p => p._1 == -id - 1 && p._2 == id && p._3 <= bound),
        s"planted pair for doc $id missing from q152 output")
    }
    // losslessness: bucketed output equals the all-pairs definition
    val corpus = docs.map { case (id, t) =>
      (id, TextKernels.dhash64(t.getBytes("UTF-8")))
    } ++ planted.map { case (id, t) =>
      (-id - 1, TextKernels.dhash64(("x" + t.substring(1)).getBytes("UTF-8")))
    }
    val brute = (for {
      (ia, ha) <- corpus; (ib, hb) <- corpus
      if ia < ib
      h = java.lang.Long.bitCount(ha ^ hb)
      if h <= 3
    } yield (ia, ib, h)).toSet
    assert(got == brute,
      s"banding lost/invented pairs: missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
  }

  test("q155 streaming phash index converges to q152's batch answer") {
    // same input, independent code paths: batch sub-banding machinery on
    // the corpus at rest vs the incremental banded index over a replay —
    // the exactly-once emission argument says the pair sets are EQUAL
    val batch = Multimodal.q152PhashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val stream = graft.streaming.PhashStream.q155StreamPhash(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(stream == batch,
      s"stream != batch: missing=${(batch -- stream).take(3)} " +
        s"extra=${(stream -- batch).take(3)}")
    assert(batch.nonEmpty)
  }

  test("q155 skewed split (large history, small batch) converges to brute force") {
    import spark.implicits._
    // Drives processBatch directly with a skewed split: 400-doc history
    // then a 10-doc batch — the steady-CDC shape where the broadcast
    // history probe does the candidate pruning (the r11 join-based path
    // that replaced the gated per-batch re-group). Planted hamming-1
    // twins pair against HISTORY docs, so cross-batch recall through the
    // exact (band, bucket) probe is exactly what this certifies.
    val rnd = new scala.util.Random(7)
    val base = (0 until 400).map(i => (i.toLong, rnd.nextLong()))
    val planted = (0 until 10).map { j =>
      val (id, h) = base(j * 17)
      (1000L + j, h ^ (1L << (j % 64)))
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_q155_spec_")
    try {
      val state = s"$tmp/state"
      graft.streaming.PhashStream.processBatch(
        spark, base.toDF("doc_id", "ph"), state, batchId = 0)
      graft.streaming.PhashStream.processBatch(
        spark, planted.toDF("doc_id", "ph"), state, batchId = 1)
      val got = graft.streaming.TxState.readBefore(spark, s"$state/pairs",
        new org.apache.spark.sql.types.StructType()
          .add("id_a", "long").add("id_b", "long").add("hamming", "int"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val all = base ++ planted
      val brute = (for {
        (ia, ha) <- all; (ib, hb) <- all
        if ia < ib
        hm = java.lang.Long.bitCount(ha ^ hb)
        if hm <= 3
      } yield (ia, ib, hm)).toSet
      assert(got == brute,
        s"armed-gate replay diverged: missing=${(brute -- got).take(3)} " +
          s"extra=${(got -- brute).take(3)}")
      assert(got.size >= 10, "planted twins should all be found")
    } finally
      graft.streaming.Replay.deleteRecursively(tmp)
  }

  test("sessionize: hand-computed fixture") {
    import spark.implicits._
    val min = 60L * 1000000L // micros
    // user 1: events at 0, 10min, 50min (gap 40min > 30min => 2 sessions)
    // user 2: single event => 1 session of 1
    val events = Seq(
      (1L, 0L), (1L, 10 * min), (1L, 50 * min), (2L, 0L))
      .toDF("user_id", "t")
      .select(col("user_id"), timestamp_micros(col("t")).as("ts"))
    val out = EventsStream.sessionize(spark, events)
      .orderBy("user_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 2L), (2L, 1L, 1L)))
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions only") {
    import spark.implicits._
    val min = 60L * 1000000L
    // user 1: sessions [0,10min] then [50min] (gap 40 > 30) — first closes
    // when the 50min event arrives; second stays open in state.
    val input = Seq((1L, 0L), (1L, 10 * min), (1L, 50 * min), (2L, 0L))
      .toDF("user_id", "t")
      .select(col("user_id"), timestamp_micros(col("t")).as("ts"))
    val sinkName = "graft_stream_sessions"
    val q = EventsStream.sessionizeStream(spark,
      // memory-stream stand-in: single-batch replay through the same API
      {
        val dir = java.nio.file.Files.createTempDirectory("sess").toString
        input.write.mode("overwrite").parquet(dir)
        spark.readStream.schema(input.schema).parquet(dir)
      })
      .writeStream.outputMode("append").format("memory").queryName(sinkName).start()
    try q.processAllAvailable() finally q.stop()
    val closed = spark.table(sinkName).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
    assert(closed.toSeq == Seq((1L, 2L))) // only user 1's first session closed
  }

  test("AvailableNow file stream processes only new run folders incrementally") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    // the SURVEY §2.9 upgrade path: the reference's newest-folder batch
    // rescan becomes an incremental file stream — a checkpoint remembers
    // processed files, so each drain picks up only newly landed runs.
    val root = java.nio.file.Files.createTempDirectory("incr").toString
    val ckpt = s"$root/ckpt"
    val data = s"$root/data"
    def land(run: Int, ids: Seq[Long]): Unit =
      ids.toDF("id").withColumn("run", lit(run))
        .write.mode("append").parquet(data)
    def drain(): Long = {
      val q = spark.readStream
        .schema("id LONG, run INT")
        .parquet(data)
        .writeStream
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", s"$root/out")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(s"$root/out").count()
    }
    land(1, Seq(1L, 2L, 3L))
    assert(drain() == 3)
    land(2, Seq(4L, 5L))
    assert(drain() == 5) // 2 new rows appended, first 3 not reprocessed
  }

  test("transformWithState sessionizer matches the legacy state API") {
    import spark.implicits._
    val min = 60L * 1000000L
    val input = Seq((1L, 0L), (1L, 10 * min), (1L, 50 * min), (2L, 0L),
      (2L, 45 * min), (2L, 100 * min))
      .toDF("user_id", "t")
      .select(col("user_id"), timestamp_micros(col("t")).as("ts"))
    val dir = java.nio.file.Files.createTempDirectory("tws").toString
    input.write.mode("overwrite").parquet(dir)
    def stream = spark.readStream.schema(input.schema).parquet(dir)
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = EventsStream.sessionizeTransformWithState(spark, stream)
        .writeStream.outputMode("append").format("memory")
        .queryName("graft_tws_sessions").start()
      try q.processAllAvailable() finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val qLegacy = EventsStream.sessionizeStream(spark, stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_legacy_sessions").start()
    try qLegacy.processAllAvailable() finally qLegacy.stop()
    def rows(t: String) = spark.table(t).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("start_us"), r.getAs[Long]("end_us"))).toSet
    val tws = rows("graft_tws_sessions")
    assert(tws == rows("graft_legacy_sessions"))
    assert(tws.nonEmpty) // closed sessions were actually emitted
  }

  test("watermark drops events that arrive later than the lateness bound") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("late").toString
    val data = s"$root/data"
    val ckpt = s"$root/ckpt"
    val out = s"$root/out"
    val hour = 3600L * 1000000L
    def land(rows: (Long, Double)*): Unit =
      rows.toSeq.toDF("t_us", "v")
        .select(timestamp_micros(col("t_us")).as("ts"), col("v"))
        .write.mode("append").parquet(data)
    def drain(): Unit = {
      val q = spark.readStream.schema("ts TIMESTAMP, v DOUBLE").parquet(data)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("w_start"), col("n"))
        .writeStream.option("checkpointLocation", ckpt)
        .format("parquet").option("path", out)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // batch 1: events in hour-0 and hour-5 → watermark advances to
    // 5h - 10min, CLOSING the hour-0 window (emitted in append mode)
    land((10L * 60 * 1000000, 1.0), (5L * hour + 1, 2.0))
    drain()
    // batch 2: a too-late hour-0 event (beyond watermark) + an on-time
    // hour-6 event advancing the watermark so hour-5 closes too
    land((20L * 60 * 1000000, 3.0), (7L * hour, 4.0))
    drain()
    val result = spark.read.parquet(out)
      .select(unix_micros(col("w_start")).as("w"), col("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hour-0 window emitted with ONE event: the late arrival was dropped,
    // not double-counted into a re-emitted window
    assert(result(0L) == 1L, s"late event leaked into closed window: $result")
    assert(result(5L * hour - 1 + 1) == 1L) // hour-5 window closed with its event
  }

  test("streaming window agg equals its batch twin") {
    val streamed = EventsStream.q31StreamWindow(spark, sf)
      .select("day", "event_type", "n_events", "sum_value")
    val batch = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).cast("timestamp").as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("day", "event_type")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("stream-static enrichment join equals its batch twin") {
    val streamed = EventsStream.q99StreamEnrich(spark, sf)
      .select("day", "segment", "n_events", "sum_value")
    val dim = Tables.customer(spark, sf)
      .filter(col("c_custkey") <= 150)
      .select(col("c_custkey"), col("c_mktsegment").as("segment"))
    val batch = Tables.events(spark, sf)
      .join(dim, col("user_id") + 1 === col("c_custkey"))
      .groupBy(to_date(col("ts")).cast("timestamp").as("day"), col("segment"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("day", "segment")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }
}
