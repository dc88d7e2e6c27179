package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus source (VERDICT r15 #4): real LLM corpora ship as
  * (compressed) JSON-lines — one document object per line — not as the
  * CSV/parquet the weather-side sources cover. This is the
  * [[graft.weather.Bronze.readLongCsvAudited]] ingestion discipline
  * applied to that format: the schema is APPLIED (never inferred — a
  * schema-inference pass over 100 TB is a full extra read, and inferred
  * types drift run to run), the parse is PERMISSIVE, and malformed
  * lines land in a quarantine column instead of silently nulling or
  * failing the job — at crawl scale some broken lines are a certainty.
  *
  * Scale notes:
  *  - uncompressed and bzip2 JSONL split by line across tasks; gzip
  *    does NOT (one task per .gz file) — a 100 TB gzip corpus must
  *    arrive as many file shards (the standard crawl layout, e.g.
  *    1k-file dumps) or be transcoded, or the scan serializes.
  *  - `multiLine` stays false: JSONL's whole point is the line protocol
  *    (splittable, streamable); a multiLine read drags whole files
  *    through single tasks.
  *  - the reader is a plain DataSource scan, so column pruning reaches
  *    the parser (Jackson skips unprojected fields) — still a full
  *    byte-scan of the text column's lines; convert to parquet at
  *    bronze ([[Layout.writePartitioned]]) for anything read twice.
  */
object Jsonl {

  /** Read JSONL with `schema` applied and malformed lines captured in
    * `_corrupt_record` (split them off with [[corruptSplit]]).
    * Compression is transparent by file extension (.gz, .bz2, ...).
    */
  def readJsonlAudited(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "schema already has a '_corrupt_record' column")
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", StringType))
      .json(path)
  }

  /** Split an audited read into (clean rows, quarantined raw lines) —
    * the [[graft.weather.Bronze.corruptSplit]] contract for JSONL: the
    * input is cached (PERMISSIVE's corrupt column is only referable
    * from a cached/re-read plan — the documented Spark pattern) and the
    * CALLER owns the lifecycle, releasing with `df.unpersist()` on the
    * handle they passed once both splits are consumed.
    */
  def corruptSplit(df: DataFrame): (DataFrame, DataFrame) = {
    val cached = df.cache()
    val clean = cached.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val bad = cached.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record")
    (clean, bad)
  }

  /** The WRITE half (round 16): publish a frame as sharded (optionally
    * compressed) JSONL — the interchange format downstream tokenizer/
    * loader stacks consume. Fully distributed (one file per task — the
    * weather sinks' no-`coalesce(1)` discipline); `shards` > 0
    * repartitions first, which is how a gzip corpus stays PARALLEL on
    * re-read (the reader's note: .gz does not split, so publish many
    * moderate shards, never one big file). Refuses a `_corrupt_record`
    * column — quarantine rows go to a quarantine sink, not back into a
    * corpus drop.
    */
  def writeJsonl(df: DataFrame, path: String, compression: String = "none",
      shards: Int = 0): Unit = {
    require(!df.columns.contains("_corrupt_record"),
      "writeJsonl: refuse to publish quarantine rows into a corpus drop " +
        "- split them off first (corruptSplit)")
    val out = if (shards > 0) df.repartition(shards) else df
    out.write.mode("overwrite")
      .option("compression", compression)
      .json(path)
  }

  /** Streaming twin of [[readJsonlAudited]] — the shape corpus drops
    * actually arrive in: a directory new (compressed) JSONL files land
    * in continuously, consumed by Spark's file stream source with the
    * SAME applied schema + PERMISSIVE quarantine contract. Compose with
    * the [[graft.streaming.Streaming]] operators (watermarked dedup,
    * incremental packing) for the live half of the ingest pipeline;
    * `maxFilesPerTrigger` bounds per-microbatch work (0 = leave unset).
    */
  def readJsonlStreamAudited(spark: SparkSession, path: String,
      schema: StructType, maxFilesPerTrigger: Int = 0): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "schema already has a '_corrupt_record' column")
    val r = spark.readStream
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", StringType))
    (if (maxFilesPerTrigger > 0)
       r.option("maxFilesPerTrigger", maxFilesPerTrigger)
     else r).json(path)
  }

  /** [[corruptSplit]] for STREAMING frames, where caching is not
    * available: Spark disallows plans whose raw-file scan is pruned to
    * ONLY the internal corrupt column, so the quarantine side returns
    * FULL rows — write them to the quarantine sink whole (which is what
    * ingest forensics wants anyway); projecting the frame down to just
    * `_corrupt_record` before the sink re-creates the unsupported plan.
    */
  def corruptSplitStream(df: DataFrame): (DataFrame, DataFrame) = {
    val clean = df.filter(col("_corrupt_record").isNull)
      .drop("_corrupt_record")
    val bad = df.filter(col("_corrupt_record").isNotNull)
    (clean, bad)
  }
}
