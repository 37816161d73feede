package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join — for each left row, attach the latest right row
  * with the same key and `rightTime <= leftTime` (the feature-lookup /
  * point-in-time-correctness primitive; Spark has no built-in).
  *
  * Spark-first composition (preference ladder (a) — no custom physical
  * node needed): tag and union both sides, then a per-key carry-forward
  * window (`last(_, ignoreNulls)` over rows unbounded-preceding..current,
  * right rows ordered before left rows at equal timestamps so ties match
  * DuckDB `ASOF JOIN ... ON l.t >= r.t` semantics). The carried payload
  * is a single struct so all right-side columns come from the SAME row.
  *
  * Cost at scale: ONE shuffle (hash by key), ONE per-partition sort —
  * the same lower bound a dedicated as-of merge operator would pay on
  * unsorted inputs. No broadcast, no range explosion, skew behaves like
  * any keyed window (salt upstream if a single key dominates).
  */
object AsOfJoin {

  /** @param payload right-side columns to carry (must exist on `right`) */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    require(payload.forall(!left.columns.contains(_)),
      "payload column names must not collide with left-side columns")
    val leftCols = left.columns.toSeq

    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .withColumn("__payload", lit(null).cast(
        right.select(payload.map(col): _*).schema match {
          case s => org.apache.spark.sql.types.StructType(s.fields)
        }))
    // a NULL right timestamp sorts first under ascending __t and would be
    // carried forward as a "match"; ASOF's rightTime <= leftTime predicate
    // never matches NULL, so drop those rows before the union
    val taggedRight = right
      .filter(col(rightTime).isNotNull)
      .select((keys.map(col) :+ col(rightTime).as("__t")) :+
        struct(payload.map(col): _*).as("__payload"): _*)
      .withColumn("__is_left", lit(0))
    // align schemas: right side lacks the left columns
    val rightAligned = leftCols.foldLeft(taggedRight) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols.map(col) ++ Seq(col("__t"), col("__is_left"), col("__payload"))): _*)

    val unioned = taggedLeft
      .select((leftCols.map(col) ++ Seq(col("__t"), col("__is_left"), col("__payload"))): _*)
      .unionByName(rightAligned)

    // __payload as the final sort key makes the pick among right rows tied
    // on (key, __t) deterministic (struct ordering: greatest payload wins);
    // left rows all carry a null payload so their relative order is inert
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__is_left"), col("__payload"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__carried.$p").as(p)): _*)
  }
}
