package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated name prefixes — dump only the
    // matching queries (dev iteration aid; the driver passes two args)
    val only: String => Boolean = if (args.length > 2) {
      val prefixes = args(2).split(',').toSeq
      name => prefixes.exists(name.startsWith)
    } else _ => true
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries.filter(kv => only(kv._1))
    selected.foreach { case (name, fn) =>
      // Clear BOTH of this query's previous artifacts up front (r10
      // ADVICE): in a reused out dir, a stale dump from an earlier run
      // next to a fresh .err would let a newly-broken query pass the
      // compare against old data — and vice versa, a stale .err next to
      // a fresh dump would fail a newly-fixed one.
      def del(p: java.nio.file.Path): Unit =
        if (Files.exists(p)) {
          val s = Files.walk(p)
          try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(q => Files.deleteIfExists(q))
          finally s.close()
        }
      del(Paths.get(s"$outDir/$name"))
      del(Paths.get(s"$outDir/$name.err"))
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // Leave an explicit on-disk marker, not just a stderr line: a
        // query that throws must surface as FAIL in the artifact, never
        // as silently-absent (r9 postmortem — 10 thrown queries simply
        // vanished from CORRECTNESS_r09.json and the gate looked green).
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Files.writeString(Paths.get(s"$outDir/$name.err"),
          s"${e.getClass.getName}: ${e.getMessage}\n")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Dump oracles only for the SELECTED queries: check.py treats the
    // oracle key set as "expected to have a dump" and FAILs any gap, so a
    // prefix-restricted dev run must not list the unselected ones.
    val json = SparkEntry.oracleSql
      .filter(kv => selected.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
