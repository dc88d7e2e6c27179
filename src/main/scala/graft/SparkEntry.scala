package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{CoreQueries, PipelineQueries}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-area registries; every entry with a
  * DuckDB-expressible equivalent also appears in `oracleSql` (same column
  * names both sides — the driver hash-compares after sorting columns by
  * name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Grouped pricing summary (SURVEY.md §2.4 A1) — the reference's central
    * aggregate shape.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator: SURVEY.md §2 reference parity
    * (CoreQueries) + the LLM-data-pipeline extension families
    * (PipelineQueries).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (approximate operators, e.g.
    * q41 IVF ANN) get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ PipelineQueries.oracle
}
