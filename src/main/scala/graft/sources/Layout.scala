package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Z-order (Morton) interleaved sort key over two non-negative int
    * dimensions — the multi-column data-skipping layout (the capability
    * behind Delta/Iceberg's OPTIMIZE ZORDER BY): sorting by a plain
    * (a, b) concatenation clusters files tightly on `a` but leaves every
    * file spanning the full range of `b`, so min/max footer stats prune
    * nothing for b-filters; interleaving the BITS of both keys gives
    * every file a narrow range in BOTH dimensions at once, and point or
    * range filters on either column skip most files.
    *
    * Pure bitwise Column arithmetic (the classic mask-and-shift bit
    * spread, 5 steps per dimension) — no custom expression needed,
    * codegen-native, and exactly reproducible in any engine with 64-bit
    * integer ops (the q122 oracle mirrors it literally). `a` must be in
    * [0, 2³²) and `b` in [0, 2³¹) (bit 31 of `b` — bit 63 interleaved —
    * would land on the long's sign bit and break range-partition
    * ordering) — rank or bucket wider domains first. Out-of-range values
    * fail LOUDLY (raise_error, the repo's convention — ADVICE r8: the
    * previous 32-bit mask wrapped a negative id to a huge positive key
    * and quietly destroyed the clustering the operator exists to
    * provide). NULLs pass through as NULL keys.
    */
  def zorderKey(a: Column, b: Column): Column = {
    def spread(c: Column, maxBits: Int): Column = {
      // null input → null condition → otherwise branch → null key
      val bound = 1L << maxBits
      val checked = when(c < 0 || c >= lit(bound), raise_error(concat(
          lit(s"zorderKey: input out of [0, 2^$maxBits): "),
          c.cast("string"))))
        .otherwise(c)
      var x = checked.cast("long").bitwiseAND(lit(0xffffffffL))
      x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000ffff0000ffffL))
      x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00ff00ff00ff00ffL))
      x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
      x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
      x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
    }
    spread(a, 32).bitwiseOR(shiftleft(spread(b, 31), 1))
  }

  /** Z-ordered parquet write: range-partition on the interleaved key
    * (so FILES tile the 2-D key space) and sort within each partition
    * (so PAGES do too), then write. `numFiles` should target the
    * cluster's preferred file size (~1 GB at 100 TB scale). The
    * data-skipping payoff is asserted quantitatively in LayoutSpec:
    * after z-ordering, a point filter on EITHER dimension finds most
    * files' min/max ranges excluding it, where a single-column sort
    * leaves every file a candidate for the other dimension.
    */
  def zorderWrite(df: DataFrame, aCol: String, bCol: String, path: String,
      numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("__z", zorderKey(col(aCol), col(bCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

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
  /** Small-files compaction — the operational fix for the
    * million-small-files problem every continuous ingest creates (each
    * micro-batch/append writes a file per task; a year of 5-minute
    * batches is ~10⁵ files per partition, and at 100 TB the NameNode/
    * listing and per-file open costs dominate the scan long before the
    * bytes do). Rewrites `inPath`'s parquet at `targetBytes`-sized files:
    * the file inventory is LISTED driver-side (metadata — file count ×
    * ~100 bytes, never data), the shard count is ceil(totalBytes /
    * targetBytes), and ONE repartition shuffle lays the rows back out.
    * Returns (filesBefore, filesAfter, totalBytes).
    *
    * Partitioned layouts pass their partition columns: rows then
    * repartition on (partitionCols, random shard within partition) and
    * the write re-partitions by the same columns, so compaction merges
    * files WITHIN each hive partition and pruning survives. Writes to
    * `outPath` — compact-then-swap is the caller's atomic-publish
    * protocol (in-place rewrite of a live dataset is how readers see
    * half a corpus); this keeps the operator a pure function of its
    * input.
    *
    * Caveat: partition VALUES are matched against their directory names
    * as strings, so values containing characters Hive percent-escapes in
    * paths (`/`, `:`, control chars …) are out of scope — partition
    * columns should be the low-cardinality clean keys (dates, sources,
    * shards) good layout design uses anyway.
    */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
      inPath: String, outPath: String, targetBytes: Long,
      partitionCols: Seq[String] = Seq.empty): (Long, Long, Long) = {
    require(targetBytes >= 1L, s"targetBytes must be >= 1, got $targetBytes")
    import spark.implicits._
    // driver-side file inventory: (relative dir, files, bytes) — metadata
    // only (~100 bytes per file), never data
    def inventory(p: String): Seq[(String, Long, Long)] = {
      val root = new org.apache.hadoop.fs.Path(p)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val rootUri = fs.makeQualified(root).toUri
      val it = fs.listFiles(root, true)
      val acc = scala.collection.mutable.Map.empty[String, (Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.startsWith("part-")) {
          val rel = rootUri.relativize(
            fs.makeQualified(f.getPath.getParent).toUri).getPath
            .stripSuffix("/")
          val (n, b) = acc.getOrElse(rel, (0L, 0L))
          acc(rel) = (n + 1L, b + f.getLen)
        }
      }
      acc.toSeq.map { case (d, (n, b)) => (d, n, b) }
    }
    def shardsFor(bytes: Long): Int =
      math.max(1L, (bytes + targetBytes - 1L) / targetBytes)
        .min(Int.MaxValue.toLong).toInt
    val inv = inventory(inPath)
    val filesBefore = inv.map(_._2).sum
    val totalBytes = inv.map(_._3).sum
    val df = spark.read.parquet(inPath)
    val out =
      if (partitionCols.isEmpty) df.repartition(shardsFor(totalBytes))
      else {
        // per-PARTITION shard counts from the same inventory (a global
        // count would let one hot partition swallow the whole budget or
        // shred a cold one): parse each "k=v/k=v" dir into its partition
        // values, broadcast-join the tiny (values -> n_shards) table
        // back, salt rows uniformly within their partition's shard
        // range, and lay out on (partitionCols, salt). Salt buckets that
        // hash into one task merge into one file — file sizes stay
        // O(targetBytes), count <= sum of per-partition shard counts.
        val saltRows = inv.map { case (dir, _, bytes) =>
          val values = dir.split("/").toSeq.map { seg =>
            val i = seg.indexOf('=')
            require(i > 0, s"compactParquet: '$dir' is not a hive layout")
            seg.substring(0, i) -> seg.substring(i + 1)
          }.toMap
          (partitionCols.map(values(_)), shardsFor(bytes))
        }
        val saltDf = broadcast(saltRows.map { case (vs, ns) => (vs, ns) }
          .toDF("__pv", "__ns")
          .select(partitionCols.zipWithIndex.map { case (c, i) =>
            element_at(col("__pv"), i + 1).as(s"__k_$c") } :+ col("__ns"): _*))
        val joined = df.join(saltDf,
          partitionCols.map(c => col(c).cast("string") === col(s"__k_$c"))
            .reduce(_ && _))
          .withColumn("__salt", (rand(42) * col("__ns")).cast("int"))
        joined
          .repartition(shardsFor(totalBytes),
            partitionCols.map(col) :+ col("__salt"): _*)
          .drop(partitionCols.map(c => s"__k_$c") :+ "__ns" :+ "__salt": _*)
      }
    val w = out.write.mode("overwrite")
    (if (partitionCols.isEmpty) w else w.partitionBy(partitionCols: _*))
      .parquet(outPath)
    val filesAfter = inventory(outPath).map(_._2).sum
    (filesBefore, filesAfter, totalBytes)
  }

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSON-lines source with the schema APPLIED — skipping inference
    * avoids the extra full scan Spark otherwise runs to sample types.
    */
  def readJsonLines(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
