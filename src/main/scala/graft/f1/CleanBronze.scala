package graft.f1

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.operators.{Flatten, Normalize}

/** Bronze→silver clean job — the reference's `Clean Bronze Data` notebook
  * (SURVEY.md §3.2): discover newest bronze run, read each dataset folder's
  * JSON pages with schema inference, flatten, normalize to the fixed
  * silver schema, stamp ingestion time, write parquet.
  *
  * Plan shape: JSON scan → Generate/Project stack (collapsed by Catalyst)
  * → single projection → parquet write. Narrow end-to-end — no shuffle —
  * so bronze cleaning scales linearly with input splits.
  */
object CleanBronze {

  /** Clean one dataset folder: read → flatten → normalize → stamp. */
  def cleanDataset(spark: SparkSession, bronzePath: String, dataset: String,
      timezone: String = "UTC"): DataFrame = {
    val normalize = F1Silver.normalizers.getOrElse(dataset,
      (d: DataFrame) => d) // unknown datasets pass through flattened
    val raw = spark.read.json(bronzePath) // S4: multi-page folder read
    Normalize.withIngestionDate(normalize(Flatten.flatten(raw)), timezone)
  }

  /** Full run: every dataset folder in the newest bronze run → silver. */
  def run(spark: SparkSession, lake: Lake, timezone: String = "UTC"): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val run = Lake.newestFolder(s"${lake.root}/bronze", conf)
      .getOrElse(sys.error(s"no bronze runs under ${lake.root}/bronze"))
    val datasets = Lake.childFolders(lake.bronzeRun(run), conf)
    datasets.foreach { ds =>
      cleanDataset(spark, lake.bronze(run, ds), ds, timezone)
        .write.mode(SaveMode.Overwrite).parquet(lake.silver(run, ds)) // S7
    }
    datasets
  }
}
