package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{AnalyticsQueries, CorpusPipeline, CorpusQueries, DedupQueries, EtlQueries, ProjectionQueries, QualityFilterQueries, RelationalQueries, SegmentationQueries, SimilarityQueries, TemporalQueries, TextAnalysisQueries}
import graft.streaming.StreamingQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query module's (name → builder) map plus its DuckDB
  * oracle twin. Column names are aligned between the Spark result and the
  * oracle SQL (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's "top destinations" shape (aggregations.sql:8-14):
    * fact ⟕ broadcast dim → count → top-k. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q02TopkJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * LLM-data-pipeline extensions (dedup, similarity, text analysis). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ TextAnalysisQueries.queries ++
      EtlQueries.queries ++ StreamingQueries.queries ++ CorpusQueries.queries ++
      CorpusPipeline.queries ++ AnalyticsQueries.queries ++
      TemporalQueries.queries ++ SegmentationQueries.queries ++
      ProjectionQueries.queries ++ QualityFilterQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ TextAnalysisQueries.oracles ++
      EtlQueries.oracles ++ StreamingQueries.oracles ++ CorpusQueries.oracles ++
      CorpusPipeline.oracles ++ AnalyticsQueries.oracles ++
      TemporalQueries.oracles ++ SegmentationQueries.oracles ++
      ProjectionQueries.oracles ++ QualityFilterQueries.oracles
}
