package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by domain objects and merged here:
  *   - [[TwseQueries]]  — the reference pipeline surface (SURVEY.md §2 A–G)
  */
object SparkEntry {

  /** Flagship query: the reference's complete daily pipeline (all three
    * golden scenarios in, the golden `investment_data` row out).
    * Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.TwsePipeline.flagship(spark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TwseQueries.queries ++ AnalyticsQueries.queries ++ TextQueries.queries ++ SimilarityQueries.queries ++ MediaStreamQueries.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables (or closed-form VALUES for fixture-driven
    * reference operators). Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    TwseQueries.oracleSql ++ AnalyticsQueries.oracleSql ++ TextQueries.oracleSql ++ SimilarityQueries.oracleSql ++ MediaStreamQueries.oracleSql
}
