package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized time-range join — pairs every left interval
  * `[startCol, endCol]` with every right row whose `timeCol` falls inside
  * it, WITHOUT an equi key. Spark plans a bare interval condition as a
  * BroadcastNestedLoopJoin — O(|L|·|R|) comparisons; this operator
  * manufactures the equi key: bin time by `binWidth`, explode each left
  * interval over the bins it covers, equi-join on bin, then apply the
  * exact interval filter. Each (left, right) pair meets in exactly one
  * bin (the right row's), so no dedup is needed.
  *
  * Cost at scale: one shuffle on bin; work is Σ per-bin |L_bin|·|R_bin| —
  * bounded by interval span / binWidth, not corpus size. Pick binWidth ≈
  * median interval length so left rows explode to O(1) bins.
  */
object RangeJoin {

  /** All columns of both inputs, one row per (interval, contained time).
    * Column names must not collide across `left` and `right`.
    */
  def bucketed(left: DataFrame, startCol: String, endCol: String,
      right: DataFrame, timeCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lb = left.withColumn("__bin",
      explode(sequence(floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    val rb = right.withColumn("__bin",
      floor(col(timeCol) / binWidth).cast("long"))
    lb.join(rb, Seq("__bin"))
      .filter(col(timeCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }
}
