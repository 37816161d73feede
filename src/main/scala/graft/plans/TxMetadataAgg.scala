package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._

import graft.operators.TxTable
import graft.sources.TxBatchRelation

/** Optimizer rule: answer UNFILTERED global metadata-derivable
  * aggregates over a clean tx snapshot from the manifest alone — zero
  * Spark jobs, zero files opened (Delta's OptimizeMetadataOnlyQuery /
  * `partitionRowCounts`' zero-scan discipline generalized to the whole
  * table). `COUNT(*)` sums the per-file `rows` lines; `MIN(col)` /
  * `MAX(col)` fold the per-file `stat` ranges. At 100 TB the
  * difference is a kilobyte manifest read vs scheduling a full scan's
  * worth of tasks to re-derive what the commit protocol already
  * recorded.
  *
  * Soundness gates — every one required, no-op otherwise:
  *   - the scan is a [[TxBatchRelation]] (the CLEAN-snapshot shape: the
  *     connector routes snapshots with live deletion vectors or a
  *     column mapping to TxMorRelation, which this rule never matches —
  *     manifest metadata predates MoR deletes, so answering from it
  *     there would resurrect deleted rows);
  *   - NOTHING stands between the aggregate and the scan but a pure
  *     column-pruning Project — any Filter/Join/generator leaves the
  *     plan untouched;
  *   - no grouping; every aggregate expression is a bare non-distinct
  *     `count(1)`/`count(*)`, `min(col)` or `max(col)` (a `count(col)`
  *     must see nulls; a DISTINCT must see values);
  *   - COUNT needs EVERY snapshot file to carry a `rows` line; MIN/MAX
  *     need EVERY file to carry a `stat` line for the column (a file
  *     whose column is all-null records no range, so coverage fails
  *     and the scan runs — stats exclude nulls exactly like MIN/MAX);
  *   - MIN/MAX fire only for EXACT-in-double types (byte/short/int/
  *     long/date): stat lines store doubles, which represent integers
  *     exactly below 2⁵³ — a fold result at or beyond that magnitude
  *     refuses (a true long that large would have rounded INTO the
  *     refused range, so the gate is airtight), and non-integral
  *     fold results (corrupt stats) refuse rather than round.
  *
  * The rewrite emits a [[LocalRelation]] carrying the aggregate's OWN
  * output attributes, so parent operators resolve unchanged; having no
  * relation left, it can never re-match (idempotent under the fixed-
  * point batch). Injected by [[graft.GraftExtensions]] and
  * self-attached by the connector at relation resolution.
  */
object TxMetadataAgg extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, exprs, child, _) =>
      txSnapshot(child) match {
        case Some(snap) =>
          val values = exprs.map(answer(_, snap))
          if (values.nonEmpty && values.forall(_.isDefined))
            LocalRelation(agg.output,
              Seq(InternalRow.fromSeq(values.map(_.get))))
          else agg
        case None => agg
      }
  }

  /** The pinned snapshot IF `p` is nothing but a (possibly
    * column-pruned) scan of a clean tx snapshot.
    */
  private def txSnapshot(p: LogicalPlan): Option[TxTable.Snapshot] =
    p match {
      case Project(projs, inner)
          if projs.forall(_.isInstanceOf[Attribute]) => txSnapshot(inner)
      case lr: LogicalRelation => lr.relation match {
        case tx: TxBatchRelation => Some(tx.snapshot)
        case _ => None
      }
      case _ => None
    }

  /** The manifest answer for one output expression — None refuses the
    * whole rewrite. Some(null) is a real answer (MIN/MAX of an empty
    * table).
    */
  private def answer(e: NamedExpression,
      snap: TxTable.Snapshot): Option[Any] = {
    val ae = e match {
      case Alias(a: AggregateExpression, _) => a
      case a: AggregateExpression => a
      case _ => return None
    }
    if (ae.isDistinct || ae.filter.nonEmpty || ae.mode != Complete)
      return None
    ae.aggregateFunction match {
      case Count(Seq(Literal(v, _))) if v != null => rowCount(snap)
      case Count(Seq()) => rowCount(snap)
      case Min(a: AttributeReference) => statExtreme(snap, a, isMin = true)
      case Max(a: AttributeReference) => statExtreme(snap, a, isMin = false)
      case _ => None
    }
  }

  private def rowCount(snap: TxTable.Snapshot): Option[Any] =
    if (snap.files.isEmpty) Some(0L)
    else if (snap.files.forall(snap.rowCounts.contains))
      Some(snap.files.iterator.map(snap.rowCounts).sum)
    else None

  private val ExactLimit = 9007199254740992d // 2^53

  private def statExtreme(snap: TxTable.Snapshot, a: AttributeReference,
      isMin: Boolean): Option[Any] = {
    val exact = a.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType => true
      case _ => false
    }
    if (!exact) return None
    if (snap.files.isEmpty) return Some(null) // MIN/MAX of nothing
    val perFile = snap.files.map { f =>
      snap.stats.getOrElse(f, Seq.empty).find(_._1 == a.name)
        .map { case (_, mn, mx, _) => if (isMin) mn else mx }
    }
    if (perFile.exists(_.isEmpty)) return None
    val folded =
      if (isMin) perFile.flatten.min else perFile.flatten.max
    if (math.abs(folded) >= ExactLimit || folded != math.rint(folded))
      return None
    a.dataType match {
      case ByteType => Some(folded.toByte)
      case ShortType => Some(folded.toShort)
      case IntegerType | DateType => Some(folded.toInt)
      case LongType => Some(folded.toLong)
      case _ => None
    }
  }

  /** Attach to a live session (the MatViewRouting lazy seam — sessions
    * built without [[graft.GraftExtensions]] get the rule the moment
    * they touch `format("tx")`, because the connector calls this from
    * relation resolution; idempotent).
    */
  def enable(spark: org.apache.spark.sql.SparkSession): Unit =
    OptimizerRules.attach(spark, this)
}
