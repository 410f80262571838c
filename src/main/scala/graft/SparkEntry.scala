package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{AnalyticsQueries, CleaningQueries, CoreQueries, CorpusQueries, EvalQueries, EventQueries, GraphQueries, PipelineQueries, QualityQueries, ScaleQueries, StatsQueries, WranglingQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a
  * deterministic DataFrame plan over the testdata at `sfDir`; `oracleSql`
  * carries the DuckDB-equivalent SQL (same column names, same ORDER BY).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0):
    * the reference's signature pipeline — union with source priority →
    * keep-first dedup → grouped count+sum pivot (SURVEY.md §3.1 compressed
    * into one plan). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val deduped = CoreQueries.queries("q04_dedup_keep_first")(spark, dir)
    deduped.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+§2.14). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ PipelineQueries.queries ++
      QualityQueries.queries ++ AnalyticsQueries.queries ++
      ScaleQueries.queries ++ EventQueries.queries ++ CorpusQueries.queries ++
      GraphQueries.queries ++ WranglingQueries.queries ++
      StatsQueries.queries ++ CleaningQueries.queries ++ EvalQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ PipelineQueries.oracles ++
      QualityQueries.oracles ++ AnalyticsQueries.oracles ++
      ScaleQueries.oracles ++ EventQueries.oracles ++ CorpusQueries.oracles ++
      GraphQueries.oracles ++ WranglingQueries.oracles ++
      StatsQueries.oracles ++ CleaningQueries.oracles ++ EvalQueries.oracles
}
