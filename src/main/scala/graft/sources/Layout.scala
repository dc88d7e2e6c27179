package graft.sources

import org.apache.spark.sql.DataFrame

/** Storage-layout operators — the write-side half of scale design.
  *
  * At 100 TB the read plan is decided when data is WRITTEN:
  *  - [[writePartitioned]]: hive-style directory partitioning; a filter
  *    on the partition column becomes partition PRUNING (whole
  *    directories skipped — `PartitionFilters` in the scan, zero I/O for
  *    excluded partitions). Choose low-cardinality columns (year, date,
  *    source); high-cardinality partitioning creates the
  *    million-small-files problem.
  *  - [[writeBucketed]]: pre-shuffles rows into a fixed number of
  *    buckets by key hash AND records it in the catalog. Joins and
  *    aggregations on the bucket key then need NO exchange — the
  *    dominant shuffle of fact-to-fact joins disappears (verified by
  *    LayoutSpec: the bucketed self-join plan contains no
  *    ShuffleExchange).
  */
object Layout {

  /** Hive-style partitioned parquet write. */
  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.partitionBy(partitionCols: _*).mode("overwrite").parquet(path)

  /** Bucketed + sorted catalog table (parquet). Bucket counts should
    * match downstream parallelism (a divisor/multiple of
    * shuffle.partitions) — mismatched bucket counts re-shuffle anyway.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").format("parquet").saveAsTable(table)

  /** JSON-lines sink (interchange format; parquet remains the analytic
    * format — JSON trades 5-10× size for universality).
    */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSON-lines source with the schema APPLIED — skipping inference
    * avoids the extra full scan Spark otherwise runs to sample types.
    */
  def readJsonLines(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
