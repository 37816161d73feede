package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't available (e.g. the skewed side feeds a
  * co-partitioned downstream op) or a single hot key exceeds what one
  * task can hold (SURVEY.md §7.4.6).
  *
  * Shape: the skewed (probe) side gets a deterministic salt in
  * [0, factor) derived from a uniformly-distributed column; the build
  * side is replicated `factor`× with every salt value. The join key
  * becomes (key, salt), splitting each hot key's rows across `factor`
  * tasks. Row-level results are identical to the unsalted join (verified
  * by SkewJoinSpec); cost is `factor`× the build side — use only when
  * the build side is small relative to the hot key's volume.
  */
object SkewJoin {

  /** `left` skewed on `keys`; `right` small enough to replicate. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      factor: Int, saltSource: Column): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = left.withColumn("__salt", pmod(hash(saltSource), lit(factor)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
