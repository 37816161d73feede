package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2 + the
  * LLM-pipeline extensions), each entry paired with a DuckDB oracle in
  * `oracleSql` where the semantics are ANSI-SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.q15Standings(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Complete.queries ++
      graft.queries.Extended.queries ++
      graft.queries.Nested.queries ++
      graft.queries.TextAnalysis.queries ++
      graft.queries.Retrieval.queries ++
      graft.queries.Series.queries ++
      graft.queries.Advanced.queries ++
      graft.queries.Advanced2.queries ++
      graft.queries.Advanced3.queries ++
      graft.queries.Advanced4.queries ++
      graft.queries.Advanced5.queries ++
      graft.queries.Advanced6.queries ++
      graft.queries.Advanced7.queries ++
      graft.queries.Advanced8.queries ++
      graft.queries.Advanced9.queries ++
      graft.queries.Advanced10.queries ++
      graft.queries.Sketches.queries ++
      graft.pipeline.TrainingData.queries ++
      graft.pipeline.Curation.queries ++
      graft.operators.TxTable.queries ++
      graft.operators.TxMaint.queries ++
      graft.operators.TxChangeFeed.queries ++
      graft.sources.TxSourceQueries.queries ++
      graft.dedup.Dedup.queries ++
      graft.dedup.Clusters.queries ++
      graft.similarity.Knn.queries ++
      graft.similarity.LshAnn.queries ++
      graft.multimodal.Multimodal.queries ++
      graft.streaming.EventsStream.queries ++
      graft.streaming.DocSetSimStream.queries ++
      graft.streaming.PhashStream.queries ++
      graft.streaming.SpanStream.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Complete.oracles ++
      graft.queries.Extended.oracles ++
      graft.queries.Nested.oracles ++
      graft.queries.TextAnalysis.oracles ++
      graft.queries.Retrieval.oracles ++
      graft.queries.Series.oracles ++
      graft.queries.Advanced.oracles ++
      graft.queries.Advanced2.oracles ++
      graft.queries.Advanced3.oracles ++
      graft.queries.Advanced4.oracles ++
      graft.queries.Advanced5.oracles ++
      graft.queries.Advanced6.oracles ++
      graft.queries.Advanced7.oracles ++
      graft.queries.Advanced8.oracles ++
      graft.queries.Advanced9.oracles ++
      graft.queries.Advanced10.oracles ++
      graft.queries.Sketches.oracles ++
      graft.pipeline.TrainingData.oracles ++
      graft.pipeline.Curation.oracles ++
      graft.operators.TxTable.oracles ++
      graft.operators.TxMaint.oracles ++
      graft.operators.TxChangeFeed.oracles ++
      graft.sources.TxSourceQueries.oracles ++
      graft.dedup.Dedup.oracles ++
      graft.dedup.Clusters.oracles ++
      graft.similarity.Knn.oracles ++
      graft.similarity.LshAnn.oracles ++
      graft.multimodal.Multimodal.oracles ++
      graft.streaming.EventsStream.oracles ++
      graft.streaming.DocSetSimStream.oracles ++
      graft.streaming.PhashStream.oracles ++
      graft.streaming.SpanStream.oracles
}
