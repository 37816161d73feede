package graft.operators

import scala.annotation.tailrec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, explode_outer}
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Recursive JSON flattener — SURVEY.md §2.2 P3, the reference's one
  * genuinely algorithmic operator (`Notebooks/Clean Bronze Data.py:53-102`).
  *
  * Semantics reproduced exactly (the downstream rename maps depend on the
  * name-mangling scheme):
  *   - every top-level column is first suffixed `*1` (depth index);
  *   - fields are scanned in schema order; the FIRST array or struct found
  *     is processed and the scan restarts;
  *   - `ArrayType` → `explode_outer` in place (null/empty arrays keep their
  *     row, matching the reference's outer semantics);
  *   - `StructType` → expanded to `parent->child*<level+1>` columns, where
  *     the parent's level is parsed after its last `*`; if the struct
  *     contains a field named like its parent column the parent is
  *     temporarily renamed `parent#1` to dodge resolution ambiguity
  *     (`Clean Bronze Data.py:82-84`; the reference checks name containment
  *     against the type's string repr — we check the child field names,
  *     which is the portable formulation of the same guard).
  *
  * Plan shape at scale: each struct expansion is a projection and each
  * array a `Generate(explode_outer)`. Catalyst's `CollapseProject` folds
  * the O(depth) stacked projections into one, so the physical plan stays
  * narrow — no shuffle is ever introduced by flattening.
  */
object Flatten {

  /** Bulk rename-select (P1, `Clean Bronze Data.py:42-43`). */
  def renameColumns(df: DataFrame, renames: Map[String, String]): DataFrame =
    df.select(df.columns.toIndexedSeq.map(c =>
      col(quote(c)).alias(renames.getOrElse(c, c))): _*)

  /** Suffix every column with `*index` (P2, `Clean Bronze Data.py:45-51`). */
  def indexColumns(df: DataFrame, index: Int): DataFrame =
    renameColumns(df, df.columns.map(c => c -> s"$c*$index").toMap)

  private def quote(name: String): String = s"`${name.replace("`", "``")}`"

  private def levelOf(name: String): Int = {
    val i = name.lastIndexOf('*')
    if (i < 0) 1 else name.substring(i + 1).toInt
  }

  /** Flatten all nested arrays/structs into `parent->child*level` columns. */
  def flatten(df: DataFrame): DataFrame = flattenLoop(indexColumns(df, 1))

  @tailrec
  private def flattenLoop(df: DataFrame): DataFrame = {
    val complex = df.schema.fields.find(f =>
      f.dataType.isInstanceOf[ArrayType] || f.dataType.isInstanceOf[StructType])
    complex match {
      case None => df
      case Some(f) =>
        f.dataType match {
          case _: ArrayType =>
            flattenLoop(df.withColumn(f.name, explode_outer(col(quote(f.name)))))
          case st: StructType =>
            val original = f.name
            val collides = st.fieldNames.contains(original)
            val current = if (collides) original + "#1" else original
            val step0 = if (collides) df.withColumnRenamed(original, current) else df
            val nextLevel = levelOf(original) + 1
            val childRenames = st.fieldNames
              .map(c => c -> s"$original->$c*$nextLevel").toMap
            val expanded = step0
              .select(col("*"), col(s"${quote(current)}.*"))
              .drop(current)
            flattenLoop(renameColumns(expanded, childRenames))
          case _ => df // unreachable
        }
    }
  }
}
