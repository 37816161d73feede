package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout scale techniques: Hive-partitioned writes prune at the
  * source, and bucketed tables co-locate joins with zero exchanges —
  * the two layout levers SURVEY.md §4 names for the 100 TB posture.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("partitioned write + partition pruning reaches the scan") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    Tables.lineitem(spark, sf)
      .withColumn("ship_year", year(col("l_shipdate")))
      .write.mode("overwrite").partitionBy("ship_year").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("ship_year") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ship_year"),
      s"no partition filter in:\n$plan")
    // pruning must reach the file listing: only one year's directory read
    val scanned = pruned.select(year(col("l_shipdate"))).distinct().collect()
    assert(scanned.map(_.getInt(0)).toSeq == Seq(1995))
  }

  test("bucketed tables join with no shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")
    val joined = spark.table("li_bucketed").join(
      spark.table("o_bucketed").hint("merge"),
      col("l_orderkey") === col("o_orderkey"))
    val exec = joined.queryExecution.executedPlan
    val shuffles = exec.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      s"expected bucketed co-located join, found shuffles:\n$exec")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE o_bucketed")
  }
}
