package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared here as a named
  * query over the driver testdata, with (where SQL-expressible) an equivalent
  * DuckDB oracle query. The per-domain registries live in `graft.queries`.
  */
object SparkEntry {

  /** All declared operator queries (name -> impl + optional oracle). */
  def all: Map[String, Q] =
    AnalyticsQueries.defs ++ VectorQueries.defs ++ FilterQueries.defs ++
      TextQueries.defs ++ PipelineQueries.defs ++ VectorAggQueries.defs ++
      SearchPipelineQueries.defs ++ AdvancedQueries.defs ++
      NeedleQLQueries.defs ++ AnnQueries.defs ++ MutationQueries.defs ++
      StreamQueries.defs ++ MultimodalQueries.defs ++ MoreSearchQueries.defs ++
      ExtrasQueries.defs ++ FederatedQueries.defs ++ TemporalQueries.defs ++
      MemoryGraphQueries.defs ++ CrdtQueries.defs ++ HookQueries.defs ++
      AnalyticsDashQueries.defs ++ AnomalyQueries.defs ++ DriftQueries.defs ++
      PrewarmQueries.defs ++ SamplingQueries.defs ++
      LanguageSurfaceQueries.defs ++ EnterpriseQueries.defs ++
      IdeQueries.defs ++ GovernanceQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("knn_cosine").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql))) => k -> sql }
}
