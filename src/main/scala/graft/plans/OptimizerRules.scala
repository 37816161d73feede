package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** The ONE check-and-append seam for attaching optimizer rules to a
  * live session. Parallel suites/queries share a single SparkSession
  * (a documented cross-suite hazard in this repo), and the naive
  * `if (!contains) cur :+ rule` read-modify-write of
  * `spark.experimental.extraOptimizations` races: two concurrent
  * enables can lose one rule (lost update) or double-add it. All three
  * self-attaching rules (TxMetadataAgg, MatViewRouting,
  * JaroWinklerPruning) route through here; the lock is the session's
  * own `experimental` handle, so independent sessions never contend.
  */
private[graft] object OptimizerRules {

  def attach(spark: SparkSession, rule: Rule[LogicalPlan]): Unit =
    spark.experimental.synchronized {
      val cur = spark.experimental.extraOptimizations
      if (!cur.contains(rule))
        spark.experimental.extraOptimizations = cur :+ rule
    }
}
