package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.SparkSpec
import graft.operators.TextAnalysis

/** JSONL corpus source (VERDICT r15 #4): schema-applied round-trip,
  * malformed-line quarantine, compressed read, and an existing
  * documents-family query driven through the reader as proof it slots
  * into the pipeline surface.
  */
class JsonlSourceSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = new StructType()
    .add("doc_id", LongType).add("text", StringType)
    .add("lang", StringType).add("source", StringType)

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en", "src0"),
    (2L, "pack my box with five dozen liquor jugs", "en", "src1"),
    (3L, "how vexingly quick daft zebras jump", "en", "src0"),
    (4L, "sphinx of black quartz judge my vow", "en", "src1"))
    .toDF("doc_id", "text", "lang", "source")

  test("round-trip: write json lines, read audited, identical rows; " +
      "no corrupt records on a clean corpus") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    docs.write.mode("overwrite").json(dir)
    val back = Jsonl.readJsonlAudited(spark, dir, docSchema)
    val (clean, bad) = Jsonl.corruptSplit(back)
    assert(bad.count() == 0L)
    assert(clean.select("doc_id", "text", "lang", "source")
      .as[(Long, String, String, String)].collect().toSet ==
      docs.as[(Long, String, String, String)].collect().toSet)
    back.unpersist()
  }

  test("malformed lines are quarantined verbatim, clean rows load; " +
      "type-mismatched lines quarantine too") {
    val dir = Files.createTempDirectory("graft_jsonl_bad").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "good row one", "lang": "en", "source": "a"}""",
      """{"doc_id": 2, "text": "good row two", "lang": "en", "source": "a"}""",
      """{"doc_id": 3, "text": "truncated object...""",
      """not json at all""",
      """{"doc_id": "not-a-number", "text": "bad type", "lang": "en", "source": "a"}""")
    Files.write(java.nio.file.Paths.get(dir, "part-0.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val back = Jsonl.readJsonlAudited(spark, dir, docSchema)
    val (clean, bad) = Jsonl.corruptSplit(back)
    assert(clean.select($"doc_id").as[Long].collect().toSet == Set(1L, 2L),
      "exactly the two clean rows load")
    val quarantined = bad.as[String].collect().toSet
    assert(quarantined.size == 3, s"expected 3 quarantined lines: $quarantined")
    assert(quarantined.contains("not json at all"),
      "raw line must survive verbatim for forensics")
    back.unpersist()
  }

  test("writeJsonl: sharded gzip publish round-trips and stays parallel " +
      "on re-read; quarantine columns are refused") {
    val dir = Files.createTempDirectory("graft_jsonl_pub").toString + "/out"
    Jsonl.writeJsonl(docs, dir, compression = "gzip", shards = 3)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.length == 3, s"3 shards requested: ${parts.toSeq}")
    assert(parts.forall(_.getName.endsWith(".gz")))
    val (clean, bad) = Jsonl.corruptSplit(
      Jsonl.readJsonlAudited(spark, dir, docSchema))
    assert(bad.count() == 0L)
    assert(clean.select("doc_id", "text", "lang", "source")
      .as[(Long, String, String, String)].collect().toSet ==
      docs.as[(Long, String, String, String)].collect().toSet)
    intercept[IllegalArgumentException] {
      Jsonl.writeJsonl(docs.withColumn("_corrupt_record", lit("x")), dir)
    }
  }

  test("gzip-compressed JSONL reads transparently (the crawl-dump layout)") {
    val dir = Files.createTempDirectory("graft_jsonl_gz").toString
    docs.write.mode("overwrite").option("compression", "gzip").json(dir)
    assert(new java.io.File(dir).listFiles().exists(_.getName.endsWith(".gz")),
      "fixture defect: no .gz part written")
    val (clean, bad) = Jsonl.corruptSplit(
      Jsonl.readJsonlAudited(spark, dir, docSchema))
    assert(bad.count() == 0L && clean.count() == 4L)
  }

  test("an existing documents-family query runs unchanged through the " +
      "JSONL reader: token stats match the in-memory path") {
    val dir = Files.createTempDirectory("graft_jsonl_q").toString
    docs.write.mode("overwrite").json(dir)
    val (clean, _) = Jsonl.corruptSplit(
      Jsonl.readJsonlAudited(spark, dir, docSchema))
    def stats(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", TextAnalysis.tokenCount($"text").as("n_tokens"),
          length($"text").as("n_chars"))
        .as[(Long, Int, Int)].collect().toSet
    assert(stats(clean) == stats(docs),
      "the documents-family projection must not care which source fed it")
  }

  test("streaming JSONL ingest: files landing across microbatches load " +
      "with the same quarantine contract") {
    val dir = Files.createTempDirectory("graft_jsonl_stream").toString
    def drop(name: String, lines: Seq[String]): Unit =
      Files.write(java.nio.file.Paths.get(dir, name),
        lines.mkString("\n").getBytes("UTF-8"))
    drop("d1.jsonl", Seq(
      """{"doc_id": 1, "text": "first drop clean", "lang": "en", "source": "a"}""",
      """broken line"""))
    val (clean, bad) = Jsonl.corruptSplitStream(
      Jsonl.readJsonlStreamAudited(spark, dir, docSchema,
        maxFilesPerTrigger = 1))
    val qc = clean.select("doc_id").writeStream.format("memory")
      .queryName("jl_clean").outputMode("append").start()
    // the quarantine sink takes FULL rows: column-pruning a raw-file
    // scan down to only the corrupt column is the exact unsupported
    // plan the corruptSplitStream scaladoc documents
    val qb = bad.writeStream.format("memory")
      .queryName("jl_bad").outputMode("append").start()
    qc.processAllAvailable(); qb.processAllAvailable()
    // second drop arrives later — the stream picks it up
    drop("d2.jsonl", Seq(
      """{"doc_id": 2, "text": "second drop clean", "lang": "en", "source": "a"}"""))
    qc.processAllAvailable(); qb.processAllAvailable()
    qc.stop(); qb.stop()
    assert(spark.table("jl_clean").as[Long].collect().toSet == Set(1L, 2L))
    assert(spark.table("jl_bad").select("_corrupt_record")
      .as[String].collect().toSet == Set("broken line"))
  }

  test("schema carrying _corrupt_record is rejected up front") {
    intercept[IllegalArgumentException] {
      Jsonl.readJsonlAudited(spark, "/tmp/nope",
        docSchema.add("_corrupt_record", StringType))
    }
  }
}
