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
  /** `events.ts` arrives in one of two parquet encodings, harness-
    * generation dependent — both normalized here to the SAME downstream
    * contract (`ts` = µs TIMESTAMP, `ts_ns` = nanosecond epoch long, the
    * collision-free ordering key window queries sort by — ADVICE r1):
    *
    *  - TIMESTAMP(NANOS) (rounds ≤ 12): Spark 4 rejects it by default
    *    (PARQUET_TYPE_ILLEGAL); sessions set
    *    `spark.sql.legacy.parquet.nanosAsLong` (in [[graft.Sessions]], at
    *    build time — never mutated here) so it reads as a nano LONG.
    *    `ts_ns` is that raw value; `ts` truncates with integer `div`,
    *    not `/` — the nano value (~1.7e18) exceeds double's 2^53 integer
    *    range, so float division would silently corrupt timestamps.
    *    Matches DuckDB's ns→µs truncation of the same files.
    *  - TIMESTAMP(MICROS) (round 13+ data): reads natively as a (NTZ)
    *    timestamp. Cast to the session-UTC instant type (bit-same wall
    *    values — the session is pinned UTC) so output schemas stay
    *    identical across harness generations; `ts_ns` = unix_micros ×
    *    1000, exactly DuckDB's `epoch_ns(ts)` on the same file, so the
    *    oracle's ordering keys and values still agree to the digit.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
