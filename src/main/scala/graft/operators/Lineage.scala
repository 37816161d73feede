package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame

/** Per-iteration lineage truncation for iterative DataFrame loops
  * (connected components, PageRank): without a cut, each round's
  * self-join doubles the logical plan and analysis goes exponential.
  *
  * Two postures, chosen by config:
  *  - default: `localCheckpoint` — blocks live in executor memory, no
  *    filesystem round-trip. Right for gate runs and single-JVM use;
  *    NOT fault-tolerant (an executor loss kills the lineage the blocks
  *    replaced).
  *  - `spark.graft.checkpoint.dir=<path>`: reliable `checkpoint()` to
  *    that directory — survives executor loss, the posture a 1000-node
  *    100 TB run wants for a loop that is hours deep when a node dies.
  *
  * Both are eager, so the caller's convergence check reads materialized
  * blocks either way (LineageSpec pins result equality across postures).
  *
  * Reliable-mode garbage: `checkpoint(true)` writes a fresh `rdd-<id>`
  * directory every call and Spark's ContextCleaner only removes them when
  * `spark.cleaner.referenceTracking.cleanCheckpoints` was set BEFORE the
  * SparkContext started — which a library cannot guarantee. An hours-deep
  * loop would otherwise grow the checkpoint dir by one full table copy per
  * round. Callers therefore pass a `chain` id for each iteratively
  * re-assigned variable: once round k's checkpoint of a chain has
  * materialized, round k-1's directory for that SAME chain is provably
  * unreferenced (the new data is fully on disk) and is deleted here.
  * Long-lived cuts (e.g. an edge table read in every round) simply omit
  * `chain` and are never deleted.
  */
object Lineage {

  val DirKey = "spark.graft.checkpoint.dir"

  /** (applicationId, chain) -> rdd-* checkpoint dirs written by the
    * chain's previous cut. Keyed by app id so a restarted driver never
    * deletes a path recorded by a dead context.
    */
  private val lastCkpt =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Set[String]]()

  /** Guards only the one-time `setCheckpointDir` conf mutation. Ownership
    * of a fresh `rdd-<id>` dir is read EXACTLY off the returned plan's
    * checkpointed RDD ([[org.apache.spark.sql.GraftBridge.checkpointFiles]]),
    * so the checkpoint job itself runs unlocked — concurrent loops on one
    * driver checkpoint in parallel (the old before/after listing diff
    * serialized every reliable cut driver-wide for the full job duration).
    */
  private val confLock = new Object

  def cut(df: DataFrame, chain: String = ""): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        confLock.synchronized {
          if (s.sparkContext.getCheckpointDir.isEmpty ||
            !s.sparkContext.getCheckpointDir.exists(_.contains(dir))) {
            s.sparkContext.setCheckpointDir(dir)
          }
        }
        val root = new Path(s.sparkContext.getCheckpointDir.get)
        val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
        val out = df.checkpoint(true) // eager: fully materialized on return
        if (chain.nonEmpty) {
          val fresh = org.apache.spark.sql.GraftBridge.checkpointFiles(out)
          val key = (s.sparkContext.applicationId, chain)
          val stale = Option(lastCkpt.put(key, fresh)).getOrElse(Set.empty)
          // the new round is on disk; the chain's previous round is garbage
          (stale -- fresh).foreach { p =>
            val path = new Path(p)
            if (path.getParent == root) fs.delete(path, true)
          }
        }
        out
      case None => df.localCheckpoint(true)
    }
  }

  /** Ends a chain's bookkeeping once its loop completes: drops the
    * `lastCkpt` entry so a long-lived driver running many loops never
    * accumulates dead (appId, chain) keys. The chain's FINAL checkpoint
    * directory is deliberately left on disk — the loop's result DataFrame
    * is still backed by it; deleting would corrupt downstream reads. One
    * surviving dir per completed chain, reclaimed at app teardown.
    */
  def endChain(df: DataFrame, chain: String): Unit =
    lastCkpt.remove((df.sparkSession.sparkContext.applicationId, chain))
}
