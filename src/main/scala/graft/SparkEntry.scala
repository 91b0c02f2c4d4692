package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{BackupQueries, CurationQueries, EtlQueries,
  PipelineQueries, ProfileQueries, RelationalQueries, ScriptQueries,
  SimilarityQueries, StreamQueries, TemporalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 coverage) to functions of
  * (session, scale-factor dir); `oracleSql` holds the equivalent DuckDB SQL
  * over the same parquet tables for the driver's hash-compare. Keys missing
  * from `oracleSql` get a weaker rows-only check (non-SQL-expressible ops).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.entries ++ BackupQueries.entries ++ EtlQueries.entries ++
      ScriptQueries.entries ++ PipelineQueries.entries ++
      SimilarityQueries.entries ++ StreamQueries.entries ++
      CurationQueries.entries ++ ProfileQueries.entries ++
      TemporalQueries.entries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ BackupQueries.oracles ++ EtlQueries.oracles ++
      ScriptQueries.oracles ++ PipelineQueries.oracles ++
      SimilarityQueries.oracles ++ StreamQueries.oracles ++
      CurationQueries.oracles ++ ProfileQueries.oracles ++
      TemporalQueries.oracles
}
