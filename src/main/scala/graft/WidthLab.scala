package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing at an EXPLICIT core/shuffle width (dev tool):
  * `runMain graft.WidthLab <query> [cpus] [sfDir]`. The core-count
  * scaling A/B the r19 verdict asked for — BenchOne stays the fixed
  * 32-core contract shape; this is the 8-vs-32 comparison harness for
  * adjudicating anti-scaling queries (q196/q181/q197 class).
  */
object WidthLab {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val cpus = if (args.length > 1) args(1) else "32"
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Bench.cleanup(spark)
      dt
    }
    println(s"[widthlab] $name cpus=$cpus min=${times.min} " +
      s"runs=${times.mkString(",")}")
    spark.stop()
  }
}
