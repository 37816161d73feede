package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev lab: measures what the Hilbert option actually buys over Morton
  * (and both over a lexicographic sort) — the per-file bounding-box
  * compactness that drives multi-dimension file skipping. For each
  * curve, range-shuffle a uniform grid into K files' worth of
  * partitions on the curve key (SAMPLED boundaries, i.e. the unaligned
  * case real commits hit) and report the mean per-file bbox cell count
  * and the coverage ratio bbox/rows (1.0 = every file is a perfectly
  * compact box; higher = the file's stat ranges admit cells it does
  * not hold, which is exactly the false-positive surface of
  * stat-range pruning). Single evaluation per layout (one job), so the
  * spark_partition_id-after-range-shuffle hazard does not apply.
  *
  * Not part of the driver contract — run with
  *   sbt -batch "runMain graft.CurveLab"
  */
object CurveLab {

  private def bboxStats(df: DataFrame,
      dims: Seq[String]): (Double, Double, Seq[Double]) = {
    val aggs = dims.flatMap(d =>
      Seq(min(col(d)).as(s"lo_$d"), max(col(d)).as(s"hi_$d"))) :+
      count(lit(1)).as("n")
    val rows = df.withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(aggs.head, aggs.tail: _*)
      .collect()
    val exts = rows.map(r => dims.map(d =>
      (r.getAs[Long](s"hi_$d") - r.getAs[Long](s"lo_$d") + 1).toDouble))
    val vols = exts.map(_.product)
    val ratios = rows.zip(vols).map { case (r, v) =>
      v / r.getAs[Long]("n").toDouble }
    (vols.sum / vols.length, ratios.sum / ratios.length,
      dims.indices.map(i => exts.map(_(i)).sum / exts.length))
  }

  def main(args: Array[String]): Unit = {
    val spark = Engine.session(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]",
      appName = "graft-curvelab")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    try {
      // 2-D: 1024x1024 cells into 64 files (16,384 rows each; an
      // ALIGNED split would be a 128x128 box = 16,384 cells, ratio 1)
      val g2 = (0 until 1024).flatMap(x => (0 until 1024).map(y =>
        (x.toLong, y.toLong))).toDF("x", "y").cache()
      g2.count()
      // 3-D: 64^3 cells into 64 files (4,096 rows each; aligned split
      // = 16x16x16 box)
      val g3 = (0 until 64).flatMap(x => (0 until 64).flatMap(y =>
        (0 until 64).map(z => (x.toLong, y.toLong, z.toLong))))
        .toDF("x", "y", "z").cache()
      g3.count()
      val layouts2 = Seq(
        ("lex", g2.repartitionByRange(64, col("x"), col("y"))),
        ("morton", g2.withColumn("k",
          graft.functions.matching.zorder_n(col("x"), col("y")))
          .repartitionByRange(64, col("k")).drop("k")),
        ("hilbert", g2.withColumn("k",
          graft.functions.matching.hilbert_n(col("x"), col("y")))
          .repartitionByRange(64, col("k")).drop("k")))
      for ((name, df) <- layouts2) {
        val (vol, ratio, ext) = bboxStats(df, Seq("x", "y"))
        println(f"[curvelab] 2d $name%-8s mean_bbox_cells=$vol%.0f " +
          f"bbox_over_rows=$ratio%.2f mean_axis_extents=" +
          ext.map(e => f"$e%.0f").mkString("x") +
          " (aligned box = 16384 cells = 128x128, ratio 1.00)")
      }
      val layouts3 = Seq(
        ("lex", g3.repartitionByRange(64, col("x"), col("y"), col("z"))),
        ("morton", g3.withColumn("k", graft.functions.matching.zorder_n(
          col("x"), col("y"), col("z")))
          .repartitionByRange(64, col("k")).drop("k")),
        ("hilbert", g3.withColumn("k", graft.functions.matching.hilbert_n(
          col("x"), col("y"), col("z")))
          .repartitionByRange(64, col("k")).drop("k")))
      for ((name, df) <- layouts3) {
        val (vol, ratio, ext) = bboxStats(df, Seq("x", "y", "z"))
        println(f"[curvelab] 3d $name%-8s mean_bbox_cells=$vol%.0f " +
          f"bbox_over_rows=$ratio%.2f mean_axis_extents=" +
          ext.map(e => f"$e%.0f").mkString("x") +
          " (aligned box = 4096 cells = 16x16x16, ratio 1.00)")
      }
    } finally spark.stop()
  }
}
