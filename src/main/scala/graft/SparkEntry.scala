package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is a named operator demonstration from
  * SURVEY.md §2, bound to the shared test tables; [[oracleSql]] carries the
  * DuckDB-equivalent ANSI SQL for hash comparison. Determinism rules
  * (total ORDER BY with unique tie-breakers, `round(x,4)` on doubles,
  * BIGINT-nanosecond event timestamps) per SURVEY.md §7.4.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q1 shape, SURVEY.md §7.2) on sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Queries.oracles
}
