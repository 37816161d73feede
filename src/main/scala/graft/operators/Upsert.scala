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
  *     swaps via rename, so a failed write never destroys the target —
  *     the same write-then-publish discipline a 1000-executor job needs
  *     (readers see old or new, never partial).
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
