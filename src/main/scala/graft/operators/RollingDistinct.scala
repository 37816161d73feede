package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding distinct count over a time grain — the DAU/WAU-family
  * operator (distinct keys per grain cell, windowed over the trailing
  * `width` cells), generalized from q138/q144 with the window width and
  * grain as parameters.
  *
  * Two paths, same output shape `(period, <out>)`:
  *
  *  - [[exact]]: reduce the fact table to DISTINCT (cell, key) ONCE,
  *    replicate each pair to the <= `width` cells it can serve (a
  *    bounded, narrow generate — never a per-cell re-read of history),
  *    keep only cells that exist in the data, and count distinct per
  *    cell. One Expand exchange; state is bounded by `width` x the
  *    reduced pair table regardless of fact size.
  *  - [[approx]]: one mergeable HLL sketch per cell (the only pass over
  *    the fact, map-side combined), then the bounded fan-out and union
  *    run over the CELL grain — O(#cells) sketch rows, never key rows.
  *    The 100 TB path when the reduced (cell, key) table itself is the
  *    bottleneck: sketches shrink the shuffle to `width` x #cells x
  *    2^lgK bytes. lgConfigK=14 gives ~0.8% standard error.
  *
  * The window is trailing: a (cell, key) pair contributes to cells
  * [cell, cell + width - 1]. Cells with no rows produce no output row
  * (matching the q138 contract); callers needing gap-filled periods can
  * join a calendar dim. `grain` is any unit valid for both `date_trunc`
  * and interval arithmetic (`day`, `hour`, `week`).
  *
  * RollingDistinctSpec certifies both paths against the brute-force
  * window definition across (grain, width) combinations; q144 keeps the
  * in-engine certification of approx vs exact at the driver gate.
  */
object RollingDistinct {

  private def windowCells(grain: String, width: Int): Column =
    expr(s"sequence(__cell, __cell + INTERVAL ${width - 1} $grain, " +
      s"INTERVAL 1 $grain)")

  /** Exact sliding distinct `key`s per `grain` cell over the trailing
    * `width` cells, as `(period, <out>)`.
    */
  def exact(df: DataFrame, ts: Column, key: Column, grain: String,
      width: Int, out: String = "n_distinct"): DataFrame = {
    require(width >= 1, s"window width must be >= 1, got $width")
    val du = df.select(date_trunc(grain, ts).as("__cell"), key.as("__key"))
      .distinct()
    val cells = du.select(col("__cell").as("period")).distinct()
    // explode_outer: InferFiltersFromGenerate would clone a computed
    // array into a size()>0 pre-filter under plain explode
    du.select(col("__key"), explode_outer(windowCells(grain, width)).as("period"))
      .join(cells, "period")
      .groupBy("period")
      .agg(countDistinct("__key").as(out))
  }

  /** Approximate sliding distinct via mergeable HLL sketches, as
    * `(period, <out>)` with a DOUBLE estimate column.
    */
  def approx(df: DataFrame, ts: Column, key: Column, grain: String,
      width: Int, lgConfigK: Int = 14,
      out: String = "approx_distinct"): DataFrame = {
    require(width >= 1, s"window width must be >= 1, got $width")
    val sk = df.select(date_trunc(grain, ts).as("__cell"), key.as("__key"))
      .groupBy("__cell")
      .agg(expr(s"hll_sketch_agg(__key, $lgConfigK)").as("__sk"))
    val cells = sk.select(col("__cell").as("period")).distinct()
    sk.select(col("__sk"), explode_outer(windowCells(grain, width)).as("period"))
      .join(cells, "period")
      .groupBy("period")
      .agg(expr("hll_sketch_estimate(hll_union_agg(__sk))").as(out))
  }
}
