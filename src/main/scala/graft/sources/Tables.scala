package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the harness star schema (TESTDATA.md).
  *
  * Mirrors the reference's source surface (SURVEY.md §2.1 S3-S5): explicit
  * file reads, no driver-side staging (the reference stages through pandas at
  * Weather_API.py:154,194 — we read distributed from the start so the scan
  * parallelizes across executors and benefits from Parquet column pruning /
  * predicate pushdown at 100 TB).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default (PARQUET_TYPE_ILLEGAL); sessions must set
    * `spark.sql.legacy.parquet.nanosAsLong` (done in [[graft.Sessions]],
    * at build time — never mutated here). Read nanos as long and convert
    * to a microsecond timestamp with integer division — `div`, not `/`:
    * the nano value (~1.7e18) exceeds double's 2^53 integer range, so
    * float division would silently corrupt timestamps. Matches DuckDB's
    * ns→µs truncation of the same files.
    *
    * `ts_ns` (the raw nanosecond long) is kept alongside as the
    * collision-free ordering key: two events in the same microsecond
    * would order differently here vs a ns-precision engine if windows
    * sorted by the truncated `ts` (ADVICE r1). Window queries order by
    * `ts_ns`, which is the same total order as the oracle's ns `ts`.
    */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
