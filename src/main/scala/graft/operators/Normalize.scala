package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Schema normalization — the reference's `renameAddSchema` pattern
  * (SURVEY.md §2.2 P1/P4/P5, `Clean Bronze Data.py:112-254`): after
  * flattening, each dataset is renamed/cast/pruned to a fixed silver
  * schema and stamped with an ingestion timestamp.
  *
  * Expressed as one declarative projection (rather than the reference's
  * stacked withColumn/withColumnRenamed/drop chain) — Catalyst collapses
  * either form to the same physical plan, but a single select keeps the
  * declared schema readable and guarantees column pruning reaches the scan.
  */
object Normalize {

  /** One silver column: source column (post-flatten mangled name) → target
    * name, with an optional cast.
    */
  final case class Field(from: String, to: String, castTo: Option[DataType] = None) {
    def toColumn: Column = {
      val c = col(s"`${from.replace("`", "``")}`")
      castTo.fold(c)(c.cast).as(to)
    }
  }

  /** Project `df` onto exactly the declared fields (drops everything else). */
  def apply(df: DataFrame, fields: Seq[Field]): DataFrame =
    df.select(fields.map(_.toColumn): _*)

  /** The reference's ingestion stamp (`Clean Bronze Data.py:26`):
    * `from_utc_timestamp(current_timestamp(), tz)` with the pipeline
    * timezone as config (reference pins Pacific/Auckland).
    */
  def withIngestionDate(df: DataFrame, timezone: String = "UTC"): DataFrame =
    df.withColumn("ingestiondate", from_utc_timestamp(current_timestamp(), timezone))
}
