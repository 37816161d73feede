package graft.operators

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
  */
object Lineage {

  val DirKey = "spark.graft.checkpoint.dir"

  def cut(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        if (s.sparkContext.getCheckpointDir.isEmpty ||
          !s.sparkContext.getCheckpointDir.exists(_.contains(dir))) {
          s.sparkContext.setCheckpointDir(dir)
        }
        df.checkpoint(true)
      case None => df.localCheckpoint(true)
    }
  }
}
