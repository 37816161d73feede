package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.operators.{TxChangeFeed, TxTable}

/** Phase-level wall-clock attribution of the q182 IVM lifecycle (dev
  * tool, guide §1): times each TxTable verb and consumer poll
  * separately, so the driver-side share ProfLab exposed (jobs sum ≪
  * wall) can be pinned to a phase. Usage:
  * `runMain graft.TxPhaseLab [sfDir] [reps]`.
  */
object TxPhaseLab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to reps).foreach { rep =>
      val acc = scala.collection.mutable.LinkedHashMap[String, Double]()
      def t[T](k: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        acc(k) = acc.getOrElse(k, 0.0) + (System.nanoTime() - t0) / 1e9
        r
      }
      val tmp = Files.createTempDirectory("graft_phaselab_")
      val bronze = s"$tmp/orders_bronze"
      val silver = s"$tmp/prio_silver"
      val proj = Seq("o_orderkey", "o_orderpriority", "o_totalprice")
      val base = graft.Tables.orders(spark, sfDir).select(proj.map(col): _*)
      t("v0_overwrite")(TxTable.commit(spark, bronze,
        base.filter(col("o_orderkey") % 4 < 2),
        TxTable.Overwrite, clusterBy = Some("o_orderkey")))
      t("v1_append")(TxTable.commit(spark, bronze,
        base.filter(col("o_orderkey") % 4 === 2),
        TxTable.Append, clusterBy = Some("o_orderkey")))
      t("v2_delete_mor")(TxTable.deleteWhere(spark, bronze,
        col("o_totalprice") < 20000.0))
      val updates = base.filter(col("o_orderkey") % 4 === 3)
        .unionByName(base
          .filter(col("o_orderkey") % 1000 === 1 && col("o_orderkey") % 4 < 3)
          .withColumn("o_totalprice", col("o_totalprice") + 1.0))
      t("v3_merge")(TxTable.mergeByKeyPruned(spark, bronze, updates,
        "o_orderkey"))
      t("v4_optimize")(TxTable.optimize(spark, bronze, 8,
        clusterBy = Seq("o_orderkey")))
      def prioFold(feed: org.apache.spark.sql.DataFrame) = {
        val sign = when(col("_change_type")
          .isin("insert", "update_postimage"), 1L).otherwise(-1L)
        feed
          .select(expr("CAST(substring(o_orderpriority, 1, 1) AS BIGINT)")
            .as("prio_no"), sign.as("sg"), col("o_totalprice"))
          .groupBy("prio_no")
          .agg(sum(col("sg")).as("n_orders"),
            sum((col("o_totalprice").cast(DecimalType(18, 2)) *
              col("sg")).cast(DecimalType(18, 2)))
              .cast(DecimalType(18, 2)).as("total_price"))
      }
      def poll(h: Long): Unit = {
        TxChangeFeed.consume(spark, bronze, silver, "ivm", "o_orderkey",
          "prio_no", upTo = Some(h))(prioFold)
        ()
      }
      t("poll_1")(poll(1L))
      t("poll_3")(poll(3L))
      t("poll_3_replay")(poll(3L))
      t("poll_4")(poll(4L))
      t("final_read")(TxTable.read(spark, silver)
        .select(col("prio_no"), col("n_orders"),
          col("total_price").cast("double").as("total_price"))
        .orderBy("prio_no")
        .write.format("noop").mode("overwrite").save())
      t("cleanup")(graft.streaming.Replay.deleteRecursively(tmp))
      val total = acc.values.sum
      println(f"[phaselab] rep $rep total=$total%.2f s")
      acc.foreach { case (k, v) =>
        println(f"[phaselab]   $k%-16s ${v}%6.2f s (${100 * v / total}%4.1f%%)")
      }
      Bench.cleanup(spark)
    }
    spark.stop()
  }
}
