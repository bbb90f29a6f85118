package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{CoreSql, CoreSqlExt, CoreSqlExt2, CoreSqlExt3, CoreSqlExt4, LlmPipeline, LlmPipelineExt, LlmPipelineExt2, LlmPipelineExt3, LlmPipelineExt4, LlmPipelineExt5, LlmPipelineExt6, LlmPipelineExt7, LlmPipelineExt8, LlmPipelineExt9, LlmPipelineExt10, LlmPipelineExt11, LlmPipelineExt12, LlmPipelineExt13, LlmPipelineExt14, LlmPipelineExt15, LlmPipelineExt16, LlmPipelineExt17, LlmPipelineExt18, Observability, ObservabilityExt, ObservabilityExt2, ObservabilityExt3, ObservabilityExt4, ObservabilityExt5, ObservabilityExt6, ObservabilityExt7, ObservabilityExt8, ObservabilityExt9, ObservabilityExt10, ObservabilityExt11, ObservabilityExt12, ObservabilityExt13, ObservabilityExt14, ObservabilityExt15, ObservabilityExt16, ObservabilityExt17, ObservabilityExt18, ObservabilityExt19, ObservabilityExt20, ObservabilityExt21, ObservabilityExt22, ObservabilityExt23, ObservabilityExt24}

/** Driver contract — see /root/repo/SURVEY.md §2 + the builder prompt.
  *
  * Every implemented operator is a [[GraftQuery]] in one of the suites;
  * SQL-expressible ones carry a DuckDB oracle that must hash-match.
  */
object SparkEntry {

  val allQueries: Seq[GraftQuery] =
    CoreSql.queries ++ CoreSqlExt.queries ++ CoreSqlExt2.queries ++
      CoreSqlExt3.queries ++ CoreSqlExt4.queries ++
      Observability.queries ++ ObservabilityExt.queries ++ ObservabilityExt2.queries ++
      ObservabilityExt3.queries ++ ObservabilityExt4.queries ++ ObservabilityExt5.queries ++
      ObservabilityExt6.queries ++ ObservabilityExt7.queries ++ ObservabilityExt8.queries ++ ObservabilityExt9.queries ++ ObservabilityExt10.queries ++ ObservabilityExt11.queries ++ ObservabilityExt12.queries ++ ObservabilityExt13.queries ++ ObservabilityExt14.queries ++ ObservabilityExt15.queries ++ ObservabilityExt16.queries ++ ObservabilityExt17.queries ++ ObservabilityExt18.queries ++ ObservabilityExt19.queries ++ ObservabilityExt20.queries ++ ObservabilityExt21.queries ++ ObservabilityExt22.queries ++ ObservabilityExt23.queries ++ ObservabilityExt24.queries ++
      LlmPipeline.queries ++ LlmPipelineExt.queries ++ LlmPipelineExt2.queries ++
      LlmPipelineExt3.queries ++ LlmPipelineExt4.queries ++ LlmPipelineExt5.queries ++
      LlmPipelineExt6.queries ++ LlmPipelineExt7.queries ++ LlmPipelineExt8.queries ++ LlmPipelineExt9.queries ++ LlmPipelineExt10.queries ++ LlmPipelineExt11.queries ++ LlmPipelineExt12.queries ++ LlmPipelineExt13.queries ++ LlmPipelineExt14.queries ++ LlmPipelineExt15.queries ++ LlmPipelineExt16.queries ++ LlmPipelineExt17.queries ++ LlmPipelineExt18.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.collect { case GraftQuery(n, _, Some(sql), _) => n -> sql.stripMargin.trim }.toMap

  def headlineQueries: Seq[GraftQuery] = allQueries.filter(_.headline)
}
