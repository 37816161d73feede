package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{TxChangeFeed, TxTable}

/** Dev tool (r19 opt round): dump the `.explain("formatted")` plan of a
  * change-feed window that includes the table's INITIAL overwrite (v0)
  * plus a rewrite version — the internal DAG the lifecycle queries
  * (q181/q182/q196/q206) execute but whose plan their checkpointed
  * return frames hide. Used for the plans/r19 before/after capture of
  * the one-sided keyedDiff short-circuit.
  */
object FeedPlanLab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = Files.createTempDirectory("graft_feedplan_")
    val root = s"$tmp/orders_feed"
    val base = graft.Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    TxTable.commit(spark, root, base.filter(col("o_orderkey") % 4 < 2),
      TxTable.Overwrite, clusterBy = Some("o_orderkey"))
    TxTable.commit(spark, root, base.filter(col("o_orderkey") % 4 === 2),
      TxTable.Append, clusterBy = Some("o_orderkey"))
    println("========== change feed window (-1, 1] including v0 ==========")
    TxChangeFeed.readChangeFeed(spark, root, -1L, 1L, "o_orderkey")
      .explain("formatted")
    graft.streaming.Replay.deleteRecursively(tmp)
    spark.stop()
  }
}
