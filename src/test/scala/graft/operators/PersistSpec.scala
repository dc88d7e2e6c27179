package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The pluggable round-staging backend (VERDICT r17 residual): default
  * localCheckpoint vs conf-selected reliable checkpoint.
  */
class PersistSpec extends SparkSpec {
  import spark.implicits._

  test("reliable backend: same results, durable files, conf-flipped") {
    val edges = (0L until 200L).map(i => (i, (i * 3) % 200))
      .toDF("src", "dst")
    val expected = Graphs.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("graftckpt")
    try {
      spark.conf.set(Persist.CheckpointDirKey, dir.toString)
      val got = Graphs.connectedComponents(edges)
        .as[(Long, Long)].collect().toMap
      assert(got == expected,
        "reliable staging changed an iterative result")
      // the rounds actually went through the durable directory
      val staged = java.nio.file.Files.walk(dir).count()
      assert(staged > 1L, s"no checkpoint files under $dir")
    } finally {
      spark.conf.unset(Persist.CheckpointDirKey)
      // the default path must still run afterwards (local staging)
      assert(Graphs.connectedComponents(edges)
        .as[(Long, Long)].collect().toMap == expected)
    }
  }
}
