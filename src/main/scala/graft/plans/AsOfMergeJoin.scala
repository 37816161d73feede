package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Backward as-of join as a dedicated physical operator — the whole-
  * operator extension path (custom `LogicalPlan` + `Strategy` +
  * `SparkPlan`) for the one primitive Spark genuinely lacks.
  *
  * Compared to the windowed composition in [[graft.operators.AsOfJoin]]
  * (tag → union → carry-forward `last() over (...)` → filter), this node
  * pays the same lower bound — one hash exchange per side + per-partition
  * sort — but:
  *   - each side is exchanged and sorted at its OWN width (the union
  *     plan sorts left rows padded with null payload columns and right
  *     rows padded with null left columns — ~2× the sort bytes);
  *   - the merge is a single forward pass with O(1) state (current match
  *     per key), no window-function machinery, no post-filter;
  *   - Catalyst still owns planning: `EnsureRequirements` inserts the
  *     exchanges/sorts from `requiredChildDistribution`/`Ordering`, so
  *     AQE, co-partitioning reuse, and whole-stage codegen around the
  *     node all behave as for built-in joins.
  *
  * v1 scope: single BIGINT key and BIGINT event-time per side (the
  * feature-lookup shape); null right keys/times are filtered below, null
  * left keys/times emit null payloads. Ties on (key, time) resolve to
  * the greatest payload tuple — identical to the windowed variant and
  * deterministic on both engines.
  */
object AsOfMergeJoin {

  /** Logical node: carries resolved child plans plus the join spec. */
  final case class AsOfJoinNode(
      left: LogicalPlan, right: LogicalPlan,
      leftKey: Attribute, leftTime: Attribute,
      rightKey: Attribute, rightTime: Attribute,
      payload: Seq[Attribute]) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ payload.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: lower the logical node to the merge exec. */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, lt, rk, rt, pay) =>
        AsOfMergeJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, pay) :: Nil
      case _ => Nil
    }
  }

  /** Physical merge join over co-partitioned, (key, time)-sorted sides. */
  final case class AsOfMergeJoinExec(
      left: SparkPlan, right: SparkPlan,
      leftKey: Attribute, leftTime: Attribute,
      rightKey: Attribute, rightTime: Attribute,
      payload: Seq[Attribute]) extends SparkPlan {

    override def children: Seq[SparkPlan] = Seq(left, right)
    override def output: Seq[Attribute] =
      left.output ++ payload.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

    // ties on (key, time) sort payload-ascending; the merge keeps the
    // LAST consumed row, so the greatest payload wins (window parity)
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
        payload.map(SortOrder(_, Ascending)))

    override def outputOrdering: Seq[SortOrder] =
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[SparkPlan]): AsOfMergeJoinExec =
      copy(left = newChildren(0), right = newChildren(1))

    override protected def doExecute(): RDD[InternalRow] = {
      val lKeyOrd = left.output.indexOf(leftKey)
      val lTimeOrd = left.output.indexOf(leftTime)
      val rKeyOrd = right.output.indexOf(rightKey)
      val rTimeOrd = right.output.indexOf(rightTime)
      val rightWidth = right.output.size
      val leftOutput = left.output
      val rightOutput = right.output
      val payloadAttrs = payload
      require(lKeyOrd >= 0 && lTimeOrd >= 0 && rKeyOrd >= 0 && rTimeOrd >= 0,
        "as-of join key/time attributes must come from the child outputs")

      // EnsureRequirements co-partitions both sides (same hash function,
      // same width) for the paired ClusteredDistributions; if an outside
      // force (a rogue rule, mismatched AQE coalescing) ever broke that,
      // zipPartitions fails loudly on unequal partition counts rather
      // than silently merging misaligned key ranges.
      left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
        // payload refs MUST be projected as nullable regardless of the
        // right child's schema: unmatched left rows read from an all-null
        // row, and a non-nullable BoundReference skips the null check and
        // would emit 0/""/false instead of NULL (caught by the random
        // equivalence property in AsOfMergeJoinSpec)
        val project = UnsafeProjection.create(
          leftOutput ++ payloadAttrs.map(_.withNullability(true)),
          leftOutput ++ rightOutput.map(_.withNullability(true)))
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rightWidth)
        var rHead: InternalRow = null     // un-consumed lookahead
        var matchRow: InternalRow = null  // last right row consumed (copied)
        var matchKey = 0L
        var hasMatch = false

        lIt.map { l =>
          if (l.isNullAt(lKeyOrd) || l.isNullAt(lTimeOrd)) {
            // null key/time never matches (ASOF predicate semantics)
            project(joined(l, nullRight))
          } else {
            val lk = l.getLong(lKeyOrd)
            val lt = l.getLong(lTimeOrd)
            var advancing = true
            while (advancing) {
              if (rHead == null && rIt.hasNext) rHead = rIt.next()
              if (rHead == null) advancing = false
              else {
                val rk = rHead.getLong(rKeyOrd)
                if (rk < lk || (rk == lk && rHead.getLong(rTimeOrd) <= lt)) {
                  if (rk == lk) { // candidate match; copy (row buffer is reused)
                    matchRow = rHead.copy(); matchKey = rk; hasMatch = true
                  }
                  rHead = null    // consumed
                } else advancing = false
              }
            }
            if (hasMatch && matchKey == lk) project(joined(l, matchRow))
            else project(joined(l, nullRight))
          }
        }
      }
    }
  }

  /** Public API: backward as-of join via the dedicated operator.
    * Key/time columns must be BIGINT on both sides; `payload` columns
    * are taken from `right` and must not collide with `left` names.
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    registerStrategy(spark)
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(payload.forall(!left.columns.contains(_)),
      "payload column names must not collide with left-side columns")

    // ASOF's rightTime <= leftTime never matches NULL; drop such rows (and
    // null keys) before the exchange so they don't poison the merge order
    val rightClean = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select((key +: rightTime +: payload).distinct.map(col): _*)

    val lPlan = left.queryExecution.analyzed
    val rPlan = rightClean.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val lk = attr(lPlan, key); val lt = attr(lPlan, leftTime)
    val rk = attr(rPlan, key); val rt = attr(rPlan, rightTime)
    require(lk.dataType == LongType && lt.dataType == LongType &&
      rk.dataType == LongType && rt.dataType == LongType,
      "v1 supports BIGINT keys and times (cast or use operators.AsOfJoin)")

    val node = AsOfJoinNode(lPlan, rPlan, lk, lt, rk, rt,
      payload.map(attr(rPlan, _)))
    org.apache.spark.sql.GraftBridge.ofRows(spark, node)
  }

  /** Idempotently add the planner strategy to an existing session. */
  def registerStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
}
