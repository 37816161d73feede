package graft.f1

import java.time.ZonedDateTime
import java.time.format.DateTimeFormatter
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Lake layout + run discovery — the reference's `File Systems Utils.py`
  * mounts and newest-folder scans (SURVEY.md §2.1 S10/S12) re-expressed as
  * a `PathResolver` over Hadoop `FileSystem` (works for local paths, HDFS,
  * and object stores alike; OAuth mount management is out of scope for a
  * library and replaced by whatever Hadoop conf the session carries).
  */
final case class Lake(root: String) {
  def bronze(run: String, dataset: String): String = s"$root/bronze/$run/$dataset"
  def bronzeRun(run: String): String = s"$root/bronze/$run"
  def silver(run: String, dataset: String): String = s"$root/silver/$run/$dataset"
  def silverRun(run: String): String = s"$root/silver/$run"
  def gold(run: String, dataset: String): String = s"$root/gold/$run/$dataset"
}

object Lake {

  /** Run-folder stamp `yyyyMMdd_HHmmss` in the pipeline timezone — the
    * reference pins NZ time (`00 - Master.json:13-43`); timezone is config
    * here (SURVEY.md §1.3 note on timezone determinism).
    */
  def runStamp(now: ZonedDateTime): String =
    now.format(DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))

  /** Newest-subfolder discovery by modification time, skipping `db/` —
    * `Clean Bronze Data.py:31-35` / `Transform Silver Data.py:29-35`.
    * Not transactional (SURVEY §2.11 Q8) — documented parity behavior.
    */
  def newestFolder(dir: String, conf: Configuration = new Configuration()): Option[String] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) return None
    fs.listStatus(path).toSeq
      .filter(s => s.isDirectory && s.getPath.getName != "db")
      .sortBy(s => (s.getModificationTime, s.getPath.getName))
      .lastOption.map(_.getPath.getName)
  }

  /** List immediate child directories (the per-dataset folders of a run). */
  def childFolders(dir: String, conf: Configuration = new Configuration()): Seq[String] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) return Seq.empty
    fs.listStatus(path).toSeq.filter(_.isDirectory).map(_.getPath.getName).sorted
  }
}
