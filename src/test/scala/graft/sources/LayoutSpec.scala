package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Storage-layout proofs: bucketing eliminates the join shuffle;
  * partitioning prunes directories at scan time.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.executedPlan

  test("bucketed tables join without any shuffle exchange") {
    // a previous JVM's managed-table dir survives while the in-memory
    // catalog doesn't — clear orphan locations before CTAS
    for (t <- Seq("bucketed_a", "bucketed_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(
        s"${sys.props("java.io.tmpdir")}/graft-warehouse/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    val df = (0 until 1000).map(i => (i.toLong % 50, s"v$i")).toDF("k", "v")
    Layout.writeBucketed(df, "bucketed_a", "k", 4)
    Layout.writeBucketed(df, "bucketed_b", "k", 4)
    val joined = spark.table("bucketed_a").as("a")
      .join(spark.table("bucketed_b").as("b"), "k")
    // Force a sort-merge join (no broadcast) so the shuffle would be
    // visible if bucketing didn't align the sides.
    val smj = joined.hint("merge")
    val exchanges = planOf(smj).collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"expected no shuffle for co-bucketed join, got:\n${planOf(smj)}")
    assert(smj.count() == 1000L * 20) // 50 keys × 20×20 matches... sanity
  }

  test("JSON-lines sink/source round-trips with an applied schema") {
    val dir = Files.createTempDirectory("graft_json").toString + "/j"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    Layout.writeJsonLines(df, dir)
    val back = Layout.readJsonLines(spark, dir, df.schema)
    // applied, not inferred (names+types; JSON reads are always nullable)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("partitioned write enables partition pruning at scan") {
    val dir = Files.createTempDirectory("graft_part").toString + "/t"
    val df = Seq((2023, 1L, "a"), (2023, 2L, "b"), (2024, 3L, "c"))
      .toDF("year", "id", "v")
    Layout.writePartitioned(df, dir, Seq("year"))
    val read = spark.read.parquet(dir).filter($"year" === 2024)
    val scan = planOf(read).collect { case s: FileSourceScanExec => s }.head
    assert(scan.partitionFilters.nonEmpty,
      "filter on the partition column must become a PartitionFilter")
    assert(read.count() == 1)
    // pruning proof: only the 2024 directory is read
    assert(scan.inputRDDs().head.partitions.nonEmpty)
    assert(scan.metadata("Location").contains(dir))
  }
}
