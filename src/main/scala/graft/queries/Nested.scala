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

  // --------------------------------------------------------------- q103
  // VARIANT (Spark 4's native semi-structured type): build a nested JSON
  // document per event, `parse_json` it into a VARIANT, and extract
  // typed fields back out with `variant_get` paths (nested object, array
  // index, three target types). VARIANT stores a parsed binary form, so
  // repeated path extraction skips re-tokenizing the JSON text — the
  // Spark-4 answer to q48's parse-once rule. The oracle recomputes every
  // extracted value from the ORIGINAL columns: the assertion is that the
  // whole encode→variant→extract chain is lossless (shortest-repr
  // doubles included).
  def q103Variant(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_id") % 11 === 0)
      .select(col("event_id"),
        to_json(struct(
          col("event_type").as("t"),
          struct(col("user_id").as("id"),
            (col("user_id") % 5).as("seg")).as("user"),
          array(col("value"), col("value") * 2).as("vals"))).as("j"))
      .select(col("event_id"), parse_json(col("j")).as("v"))
      .select(col("event_id"),
        expr("variant_get(v, '$.t', 'string')").as("t"),
        expr("variant_get(v, '$.user.id', 'bigint')").as("uid"),
        expr("variant_get(v, '$.user.seg', 'bigint')").as("seg"),
        expr("variant_get(v, '$.vals[1]', 'double')").as("val2"))
      .orderBy("event_id")

  val q103Sql: String =
    """SELECT event_id, event_type AS t, user_id AS uid,
      |  user_id % 5 AS seg, value * 2 AS val2
      |FROM events WHERE event_id % 11 = 0 ORDER BY event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_flatten" -> (q17Flatten _),
    "q103_variant" -> (q103Variant _))

  val oracles: Map[String, String] = Map(
    "q17_flatten" -> q17Sql,
    "q103_variant" -> q103Sql)
}
