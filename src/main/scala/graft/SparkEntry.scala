package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one named query per implemented operator (SURVEY.md §2
  * inventory + the large-scale extension operators); `oracleSql` carries the
  * DuckDB-equivalent SQL for every query that ANSI SQL can express. Queries
  * without an oracle entry get the driver's weaker rows-only check.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ TextQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ EventQueries.queries ++
      MultimodalQueries.queries ++ CorpusQueries.queries ++
      SearchQueries.queries ++ CampaignQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracles ++ TextQueries.oracles ++ DedupQueries.oracles ++
      SimilarityQueries.oracles ++ EventQueries.oracles ++
      MultimodalQueries.oracles ++ CorpusQueries.oracles ++
      SearchQueries.oracles ++ CampaignQueries.oracles
}
