package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.QueryRegistry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All queries live in [[graft.queries.QueryRegistry]], one entry per
  * implemented operator from SURVEY.md §2.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * e2e_collect_full is the reference's signature operation at full
    * fidelity: real TIFF-decode point lookups, broadcast CSV attribute
    * classify, MODIS argmax selection, fire-weather risk, masked
    * elevation stats — pivoted into nested ContainerOutput /
    * AggregatedResponse envelopes, error paths included. */
  def entry(spark: SparkSession): DataFrame =
    queries("e2e_collect_full")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QueryRegistry.oracleSql
}
