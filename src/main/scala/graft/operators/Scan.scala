package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix scans — global row numbers and running aggregates
  * over a total order WITHOUT a single-partition window.
  *
  * A bare `Window.orderBy(...)` funnels the entire input through ONE
  * task: fine when the input is a bounded grain (months, days, a small
  * dim aggregate), a scale-killer when it grows with the data (documents,
  * customers, distinct prices). The classic fix is the two-pass parallel
  * scan: split the order into contiguous buckets, compute the scan
  * locally per bucket, then combine per-bucket summaries (one tiny row
  * per bucket) into exclusive carry-ins that are broadcast back. The only
  * remaining un-partitioned window runs over that summary table — at most
  * `buckets` rows by construction, independent of input size
  * (PlanShapeSpec's blanket guard recognizes this shape structurally via
  * the `__pid` grouping beneath it).
  *
  * Bucket assignment is a DETERMINISTIC function of the row — min/max
  * linear interpolation on the leading order column, attached as a 1-row
  * broadcast — NOT `spark_partition_id()` after `repartitionByRange`.
  * The range exchange samples its boundaries with an RDD-id-dependent
  * seed, so the two consumers of the scan (the ranked rows and the
  * per-bucket counts) can see DIFFERENT partition assignments whenever
  * column pruning makes their subplans non-identical and defeats
  * ReuseExchange — an off-by-a-few rank bug that only appears once the
  * input outgrows the boundary sample (ScanSpec pins the fixed behavior
  * across bucket counts). Min/max are order-insensitive aggregates, so
  * every re-evaluation agrees.
  *
  * Requirements: `orderCols` must be a total (duplicate-free) order with
  * a NUMERIC leading column — callers append a unique tie-breaker, same
  * as for any deterministic rank. Skewed leading-column distributions
  * degrade bucket balance, not correctness (rows equal on the leading
  * column always share a bucket; the within-bucket sort restores the full
  * order).
  *
  * Cost note: the two passes (rows, bucket summaries) and the bounds
  * aggregate each reference the input subplan; correctness does NOT
  * depend on them seeing identical data placement (the bucket id is a
  * pure function of the row), and in practice AQE stage reuse dedupes
  * the expensive shared prefix — q131's per-customer aggregate shuffle
  * plans once with ReusedExchange for the other consumers, so the
  * recomputation is projection-level, not another fact shuffle.
  */
object Scan {

  private val Pid = "__pid"

  /** Tag each row with its deterministic order-bucket id in
    * [0, buckets): nulls-first rows get bucket -1, matching the window
    * form's NULLS FIRST default.
    *
    * Two boundary strategies, both deterministic under re-evaluation:
    *  - default: min/max linear interpolation — zero extra passes (the
    *    1-row bounds aggregate rides a broadcast), balanced whenever the
    *    leading column is roughly uniform. Degrades to ONE hot bucket
    *    when the value range is dominated by outliers or the column is
    *    duplicate-heavy (e.g. 90% of rows share a few small values under
    *    a large max).
    *  - `equiDepth = true`: k-1 approx_percentile boundaries, computed
    *    ONCE at call time and frozen into the plan as literals. The
    *    collect is deliberate, not a scale smell: it is k-1 doubles —
    *    exactly what RangePartitioner collects driver-side — and
    *    freezing removes the re-evaluation hazard entirely (a broadcast
    *    SUBPLAN of a sketch aggregate could re-run per consumer, and
    *    sketch merge order is not run-stable; a literal cannot diverge).
    *    Bucket skew is then bounded by max(duplicate-value frequency,
    *    ~1/k + sketch error) regardless of the value distribution.
    * Rows equal on the leading column always share a bucket under both
    * strategies (required: the within-bucket sort restores the full
    * order), so a single value holding p% of all rows implies a p%
    * bucket no boundary choice can split.
    */
  private[graft] def bucketed(df: DataFrame, orderCols: Seq[Column],
      buckets: Int, equiDepth: Boolean): DataFrame = {
    val c1 = orderCols.head.cast("double")
    if (equiDepth) {
      val probs = (1 until buckets).map(_.toDouble / buckets).toArray
      val row = df.select(percentile_approx(c1,
        lit(probs), lit(10000)).as("__bs")).head()
      val bs: Array[Double] =
        if (row.isNullAt(0)) Array.empty // empty/all-null input
        else row.getSeq[Double](0).toArray
      val arr = lit(bs)
      df.withColumn(Pid,
        when(c1.isNull, lit(-1))
          // #boundaries strictly below the value: monotone in the order,
          // ties collapse to the lower bucket, range [0, buckets-1]
          .otherwise(size(filter(arr, b => b < c1))).cast("int"))
    } else {
      val bounds = df.select(min(c1).as("__lo"), max(c1).as("__hi"))
      df.crossJoin(broadcast(bounds))
        .withColumn(Pid,
          when(c1.isNull, lit(-1))
            .when(col("__hi") === col("__lo"), lit(0))
            .otherwise(least(
              floor((c1 - col("__lo")) /
                ((col("__hi") - col("__lo")) / buckets)),
              lit(buckets - 1))).cast("int"))
        .drop("__lo", "__hi")
    }
  }

  /** Global 1-based row_number over `orderCols` as column `out`; when
    * `totalOut` is set, the overall row count rides along on the same
    * broadcast (no second pass over the data).
    */
  def withGlobalRowNumber(df: DataFrame, orderCols: Seq[Column], out: String,
      partitions: Int = 32, totalOut: Option[String] = None,
      equiDepth: Boolean = false): DataFrame = {
    val r = bucketed(df, orderCols, partitions, equiDepth)
    val local = Window.partitionBy(Pid).orderBy(orderCols: _*)
    val counts = r.groupBy(Pid).agg(count(lit(1)).as("__n"))
    // exclusive prefix sum over <= `partitions` summary rows
    val tiny = Window.orderBy(Pid).rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.orderBy(Pid)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets0 = counts
      .withColumn("__off", coalesce(sum("__n").over(tiny), lit(0L)))
    val offsets = totalOut match {
      case Some(t) => offsets0.withColumn(t, sum("__n").over(all))
        .select(Pid, "__off", t)
      case None => offsets0.select(Pid, "__off")
    }
    r.withColumn("__lrn", row_number().over(local).cast("long"))
      .join(broadcast(offsets), Seq(Pid))
      .withColumn(out, col("__lrn") + col("__off"))
      .drop(Pid, "__lrn", "__off")
  }

  /** NTILE(k) bucket (1-based) from a global rank and the total row
    * count — standard SQL semantics: with n = k·q + m, the first m
    * buckets hold q+1 rows. Pure arithmetic, so an exact NTILE needs
    * only [[withGlobalRowNumber]] (rank + totalOut), never a
    * single-partition window. Integer division happens in doubles
    * (exact below 2^53, and an even quotient of exact integers cannot
    * round across the floor boundary).
    */
  def ntileBucket(rank: Column, n: Column, k: Int): Column = {
    val q = floor(n / k).cast("long")
    val m = (n % k).cast("long")
    val cut = m * (q + lit(1L)) // rows covered by the (q+1)-sized buckets
    when(rank <= cut, floor((rank - 1) / (q + 1)) + 1)
      .otherwise(m + floor((rank - 1 - cut) / q) + 1)
      .cast("long")
  }

  /** Exclusive running max of `value` over `orderCols` as column `out`
    * (null for the globally first row, matching an un-partitioned
    * `max().over(rowsBetween(unboundedPreceding, -1))`).
    */
  def withRunningMax(df: DataFrame, orderCols: Seq[Column], value: Column,
      out: String, partitions: Int = 32,
      equiDepth: Boolean = false): DataFrame = {
    val r = bucketed(df, orderCols, partitions, equiDepth)
    val local = Window.partitionBy(Pid).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val summaries = r.groupBy(Pid).agg(max(value).as("__pm"))
    val tiny = Window.orderBy(Pid).rowsBetween(Window.unboundedPreceding, -1)
    val prev = summaries
      .withColumn("__pprev", max("__pm").over(tiny))
      .select(Pid, "__pprev")
    // greatest() skips nulls, so it coalesces the (null-for-first-row)
    // local prefix with the (null-for-first-bucket) carry-in
    r.withColumn("__lmax", max(value).over(local))
      .join(broadcast(prev), Seq(Pid))
      .withColumn(out, greatest(col("__lmax"), col("__pprev")))
      .drop(Pid, "__lmax", "__pprev")
  }

  /** Exclusive running sum of `value` over `orderCols` as column `out`
    * (null for the globally first row, matching the un-partitioned
    * window form); when `totalOut` is set, the grand total of `value`
    * rides the same broadcast — no second pass over the data.
    */
  def withRunningSum(df: DataFrame, orderCols: Seq[Column], value: Column,
      out: String, partitions: Int = 32,
      totalOut: Option[String] = None,
      equiDepth: Boolean = false): DataFrame = {
    val r = bucketed(df, orderCols, partitions, equiDepth)
    val local = Window.partitionBy(Pid).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val summaries = r.groupBy(Pid).agg(sum(value).as("__ps"))
    val tiny = Window.orderBy(Pid).rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.orderBy(Pid)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val prev0 = summaries.withColumn("__pprev", sum("__ps").over(tiny))
    val prev = totalOut match {
      case Some(t) => prev0.withColumn(t, sum("__ps").over(all))
        .select(Pid, "__pprev", t)
      case None => prev0.select(Pid, "__pprev")
    }
    r.withColumn("__lsum", sum(value).over(local))
      .join(broadcast(prev), Seq(Pid))
      .withColumn(out,
        when(col("__lsum").isNull && col("__pprev").isNull, lit(null))
          .otherwise(coalesce(col("__lsum"), lit(0)) +
            coalesce(col("__pprev"), lit(0))))
      .drop(Pid, "__lsum", "__pprev")
  }
}
