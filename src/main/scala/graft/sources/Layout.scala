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

  /** Training-shard LAYOUT PLAN — the last mile between curation and a
    * data-loader-consumable artifact: every document gets its training
    * coordinates (shard, pos, pack_id, pack_offset) by composing the
    * two already-gated planners —
    * [[graft.operators.Sampling.deterministicShuffle]] (decorrelate
    * source order: shard = md5-bucket of the id, pos = hash-order rank
    * in the shard) and [[graft.operators.Sampling.packSequences]]
    * (concat-and-chunk every `budget` tokens, in shuffled `pos` order,
    * so packs mix sources the way the loader will consume them).
    *
    * Scale shape: ONE shuffle total. Both windows partition by `shard`,
    * so the pack window reuses the shuffle window's exchange (asserted
    * in LayoutSpec); everything downstream — including the partitioned
    * write in [[writeTrainingShards]] — consumes rows already hash-
    * partitioned by shard and sorted by (shard, pos). `shards` must
    * grow with the corpus so one shard fits one task's sort — the
    * documented contract of both planners.
    */
  def planTrainingShards(df: DataFrame, tokenCol: String, idCol: String,
      shards: Int, budget: Long): DataFrame =
    graft.operators.Sampling.packSequences(
      graft.operators.Sampling.deterministicShuffle(df, idCol, shards),
      tokenCol, budget, Seq("shard"), "pos")

  /** Materialize [[planTrainingShards]] as hive-partitioned parquet:
    * one `shard=N/` directory per shard, rows pos-ordered WITHIN each
    * file because the pack window already emits (shard, pos)-sorted
    * streams and the writer's required ordering (the partition column)
    * is a satisfied prefix — no extra sort, no extra shuffle at write.
    * A loader reads `shard=K` (partition-pruned) and streams rows in
    * stored order.
    */
  def writeTrainingShards(df: DataFrame, path: String, tokenCol: String,
      idCol: String, shards: Int, budget: Long): Unit =
    planTrainingShards(df, tokenCol, idCol, shards, budget)
      .write.partitionBy("shard").mode("overwrite").parquet(path)

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
