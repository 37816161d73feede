package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** One-query shuffle accounting for SCALE.md evidence rows: runs a
  * [[SparkEntry.queries]] entry at a given SF and prints the task-level
  * shuffle write/read byte and record totals (the numbers a plan-shape
  * claim like "the rekeyed join moves hashes, not text" must cash out
  * as). Same-boot A/B protocol as [[BenchOne]]: compare two probes from
  * the same VM boot, never across boots.
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
    // SPARK_GRAFT_NOBROADCAST=1 probes the at-scale shuffle regime: on a
    // 1000-executor 100 TB run the corpus-sized sides of a join cannot
    // broadcast, so byte claims about "what moves through the shuffle"
    // must be measured with the broadcast escape hatch closed
    val spark = (if (sys.env.get("SPARK_GRAFT_NOBROADCAST").contains("1"))
      b.config("spark.sql.autoBroadcastJoinThreshold", "-1") else b)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wB = new AtomicLong(0L); val wR = new AtomicLong(0L)
    val rB = new AtomicLong(0L); val rR = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          wB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          wR.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          rB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          rR.addAndGet(m.shuffleReadMetrics.recordsRead)
        }
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
    println(f"[shuffleprobe] $name sf=$sfDir sec=$sec%.2f " +
      s"shuffle_write_bytes=${wB.get} shuffle_write_records=${wR.get} " +
      s"shuffle_read_bytes=${rB.get} shuffle_read_records=${rR.get}")
    spark.stop()
  }
}
