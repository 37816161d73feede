package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** MERGE/upsert on plain parquet tables — the transactional-lite pattern
  * behind the reference's overwrite-only lake (SURVEY §1.1: every write is
  * `mode('overwrite')`, incrementality lives at the folder level) upgraded
  * to row-level upsert semantics (the Delta-Lake MERGE shape named in the
  * north star, without the Delta dependency).
  *
  * Semantics of [[mergeByKey]] = `MERGE ... WHEN MATCHED THEN UPDATE SET *
  * WHEN NOT MATCHED THEN INSERT *`: an update row replaces every same-key
  * base row; unmatched update rows are inserted.
  *
  * Scale notes:
  *   - the anti-join shuffles base ONCE on the key (or broadcasts the
  *     update keyset when small — the common CDC case: daily delta ≪
  *     table); the union is free (no exchange);
  *   - [[upsertParquet]] stages the merged table NEXT TO the live one and
  *     swaps via two renames, so a failed WRITE never destroys the target.
  *     The swap itself is not atomic: between retiring the old copy and
  *     publishing the staged one there is a short window where `path` does
  *     not exist, and a crash inside that window leaves the data only in
  *     `<path>.retired` (recovery: rename it back). Object stores / HDFS
  *     have no multi-path atomic rename — full isolation needs a table
  *     format with a transaction log (Delta/Iceberg), which is out of
  *     scope per SURVEY §1.1.
  */
object Upsert {

  /** Row-level MERGE semantics on DataFrames (update matched, insert new). */
  def mergeByKey(base: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    base.join(updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(updates.select(base.columns.map(col).toIndexedSeq: _*))
  }

  /** Merge `updates` into the parquet table at `path` with staged-swap
    * publication. Returns the merged row count.
    */
  def upsertParquet(spark: SparkSession, path: String, updates: DataFrame,
      keys: Seq[String]): Long = {
    val base = spark.read.parquet(path)
    val merged = mergeByKey(base, updates, keys)
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new Path(path + ".staged")
    val retired = new Path(path + ".retired")
    merged.write.mode(SaveMode.Overwrite).parquet(staged.toString)
    val n = spark.read.parquet(staged.toString).count()
    fs.delete(retired, true)
    if (!fs.rename(target, retired)) {
      throw new java.io.IOException(s"cannot retire $target")
    }
    if (!fs.rename(staged, target)) {
      fs.rename(retired, target) // roll back
      throw new java.io.IOException(s"cannot publish $staged")
    }
    fs.delete(retired, true)
    n
  }
}
