package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level profile of one query (dev tool, guide §1/§7): runs
  * `BenchOne`-style but records every Spark job's wall time and call
  * site, printing a sorted breakdown — the local-mode stand-in for the
  * UI's Jobs page (spark.ui is disabled in this sandbox). Usage:
  * `runMain graft.ProfLab <query> [sfDir]`.
  */
object ProfLab {

  private final class JobLog extends SparkListener {
    final case class Row(desc: String, t0: Long, var ms: Long = -1L)
    val rows = new ConcurrentHashMap[Int, Row]()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      val site = Option(j.properties)
        .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
      val desc = Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse(site)
      rows.put(j.jobId, Row(desc, System.nanoTime()))
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = {
      val r = rows.get(j.jobId)
      if (r != null) r.ms = (System.nanoTime() - r.t0) / 1000000L
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    // warm run (JIT/codegen), then the profiled run
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    Bench.cleanup(spark)
    val log = new JobLog
    spark.sparkContext.addSparkListener(log)
    // low-rate stack sampler over ALL live threads (guide §7.3's driver
    // thread-dump, automated): counts frames so the idle-gap time the
    // job log exposes can be attributed to planning vs commit vs I/O
    val frameCounts = new ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val stacks = Thread.getAllStackTraces
        stacks.forEach { (th, st) =>
          if (th.getState == Thread.State.RUNNABLE && st.nonEmpty &&
            !th.getName.contains("sampler")) {
            st.take(24).foreach { f =>
              val cls = f.getClassName
              if (cls.startsWith("org.apache.spark.sql.catalyst") ||
                cls.startsWith("org.apache.spark.sql.execution") ||
                cls.startsWith("org.codehaus.janino") ||
                cls.startsWith("graft") ||
                cls.startsWith("org.apache.parquet") ||
                cls.startsWith("org.apache.hadoop")) {
                val key = s"$cls.${f.getMethodName}"
                frameCounts.merge(key, 1, (a, b) => a + b)
              }
            }
          }
        }
        Thread.sleep(20)
      }
    }, "proflab-sampler")
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    org.apache.spark.graft.ListenerBusDrain.drain(spark.sparkContext)
    import scala.jdk.CollectionConverters._
    val rows = log.rows.asScala.toSeq.sortBy(_._1)
    val done = rows.collect { case (id, r) if r.ms >= 0 => (id, r) }
    println(f"[proflab] $name wall=$wall%.2f s, jobs=${rows.size}, " +
      f"job-ms-sum=${done.map(_._2.ms).sum}")
    done.foreach { case (id, r) =>
      println(f"[proflab] job $id%4d ${r.ms}%6d ms  ${r.desc.take(110)}")
    }
    // idle-gap attribution: windows where NO job ran (driver-side work —
    // planning, manifest I/O, commit protocol; guide §7.3's "nothing is
    // running" class), keyed by the job that eventually broke the gap
    val spans = done.map { case (id, r) => (id, r.t0, r.t0 + r.ms * 1000000L) }
      .sortBy(_._2)
    var cursor = t0
    spans.foreach { case (id, s0, s1) =>
      val gapMs = (s0 - cursor) / 1000000L
      if (gapMs > 100)
        println(f"[proflab] GAP $gapMs%6d ms before job $id%4d")
      cursor = math.max(cursor, s1)
    }
    val tailMs = (System.nanoTime() - cursor) / 1000000L
    if (tailMs > 100) println(f"[proflab] GAP $tailMs%6d ms after last job")
    println("[proflab] hottest sampled frames (all runnable threads):")
    frameCounts.asScala.toSeq.sortBy(-_._2.intValue).take(30).foreach {
      case (k, n) => println(f"[proflab]   $n%5d  $k")
    }
    spark.stop()
  }
}
