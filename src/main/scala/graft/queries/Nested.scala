package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Flatten

/** Nested-data surface: JSON parsing + the P3 flattener driven end-to-end
  * (SURVEY.md §2.2 P3, §3.2) over the events table's JSON `props` column.
  *
  * The query builds the bronze shape the reference flattens — structs,
  * nested structs, arrays, and a JSON-inferred object — then runs
  * [[Flatten.flatten]] and returns the path-mangled flat columns. The
  * DuckDB oracle reproduces the same rows with quoted aliases, proving the
  * flattener's semantics (explode multiplicity, name scheme) byte-for-byte.
  */
object Nested {

  def q17Flatten(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val bronzeShaped = ev.select(
      col("event_id"),
      struct(
        col("user_id").as("uid"),
        struct(col("event_type").as("kind")).as("meta")).as("who"),
      array(col("value"), col("value") * 2).as("vals"),
      from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("props"))
    Flatten.flatten(bronzeShaped)
      .orderBy(col("`event_id*1`"), col("`vals*1`"))
  }

  val q17Sql: String =
    """SELECT event_id AS "event_id*1",
      |  user_id AS "who*1->uid*2",
      |  event_type AS "who*1->meta*2->kind*3",
      |  UNNEST([value, value * 2]) AS "vals*1",
      |  CAST(json_extract_string(props, '$.k') AS INT) AS "props*1->k*2"
      |FROM events ORDER BY "event_id*1", "vals*1"""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_flatten" -> (q17Flatten _))

  val oracles: Map[String, String] = Map(
    "q17_flatten" -> q17Sql)
}
