package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.sources.TxBatchRelation

/** Optimizer rule: answer an UNFILTERED global `COUNT(*)` over a clean
  * tx snapshot from the manifest's per-file `rows` lines — zero Spark
  * jobs, zero files opened (Delta's OptimizeMetadataOnlyQuery /
  * `partitionRowCounts`' zero-scan discipline generalized to the whole
  * table). At 100 TB the difference is a kilobyte manifest read vs
  * scheduling a full scan's worth of tasks to count what the commit
  * protocol already recorded.
  *
  * Soundness gates — every one required, no-op otherwise:
  *   - the scan is a [[TxBatchRelation]] (the CLEAN-snapshot shape: the
  *     connector routes snapshots with live deletion vectors or a
  *     column mapping to TxMorRelation, which this rule never matches —
  *     manifest row counts predate MoR deletes, so counting them there
  *     would resurrect deleted rows);
  *   - NOTHING stands between the aggregate and the scan but a pure
  *     column-pruning Project — any Filter/Join/generator leaves the
  *     plan untouched;
  *   - no grouping, and every aggregate expression is a bare
  *     non-distinct `count(1)`/`count(*)` (a `count(col)` must see
  *     nulls; a DISTINCT must see values);
  *   - EVERY snapshot file carries a manifest `rows` line (recorded by
  *     every commit since r12; a pre-rows manifest degrades to the
  *     scan, never to a guess).
  *
  * The rewrite emits a [[LocalRelation]] carrying the aggregate's OWN
  * output attributes, so parent operators resolve unchanged; having no
  * relation left, it can never re-match (idempotent under the fixed-
  * point batch). Injected by [[graft.GraftExtensions]].
  */
object TxMetadataCount extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, exprs, child, _) =>
      (pureTxScan(child), countsOnly(exprs)) match {
        case (Some(n), true) =>
          val row = InternalRow.fromSeq(agg.output.map(_ => n))
          LocalRelation(agg.output, Seq(row))
        case _ => agg
      }
  }

  /** The manifest row count IF `p` is nothing but a (possibly
    * column-pruned) scan of a clean tx snapshot with full coverage.
    */
  private def pureTxScan(p: LogicalPlan): Option[Long] = p match {
    case Project(projs, inner) if projs.forall(_.isInstanceOf[Attribute]) =>
      pureTxScan(inner)
    case lr: LogicalRelation => lr.relation match {
      case tx: TxBatchRelation =>
        val snap = tx.snapshot
        if (snap.files.nonEmpty &&
            snap.files.forall(snap.rowCounts.contains))
          Some(snap.files.iterator.map(snap.rowCounts).sum)
        else if (snap.files.isEmpty) Some(0L)
        else None
      case _ => None
    }
    case _ => None
  }

  /** Every output is a bare non-distinct count of a non-null literal
    * (count(1) / count(*)); aliases tolerated, anything else refuses.
    */
  private def countsOnly(exprs: Seq[NamedExpression]): Boolean =
    exprs.nonEmpty && exprs.forall {
      case Alias(ae: AggregateExpression, _) => isCountStar(ae)
      case ae: AggregateExpression => isCountStar(ae)
      case _ => false
    }

  private def isCountStar(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && ae.mode == Complete &&
      (ae.aggregateFunction match {
        case Count(Seq(Literal(v, _))) => v != null
        case Count(Seq()) => true
        case _ => false
      })

  /** Attach to a live session (the MatViewRouting lazy seam — sessions
    * built without [[graft.GraftExtensions]] get the rule the moment
    * they touch `format("tx")`, because the connector calls this from
    * relation resolution; idempotent).
    */
  def enable(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}
