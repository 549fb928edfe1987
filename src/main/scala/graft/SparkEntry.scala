package graft

import graft.model.TrendQuery
import graft.operators.{Daily, GapFill, Trend}
import graft.sources.Cdx
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Fixed "today" (reference main.py:199,387 uses the wall clock; we
    * inject it for determinism — SURVEY §7.4 risk 4). All testdata SFs
    * span 2024-01-01..2024-01-30, so this leaves a ~30-day unobserved
    * tail that exercises the decay path.
    */
  val AsOf: String = Queries.AsOf

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the full multi-URL scored daily series (parse -> daily agg ->
    * gap fill -> densify -> sigmoid recurrence).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.scored(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracle.all
}
