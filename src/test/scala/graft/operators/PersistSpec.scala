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

  test("stats clamp (round 19): a self-join tower stays plannable — " +
      "carried sizeInBytes bounded, true small sizes pass through") {
    def carried(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.analyzed.stats.sizeInBytes
    // the hazard shape: each round self-joins the previous STAGED frame
    // (connectedComponents' pointer jump). Unclamped, the carried
    // estimate SQUARES per round: by round 24 it would be a ~2^24-bit
    // BigInt and the driver would grind inside BigInteger.multiply in
    // broadcast-size estimation (observed on q230 at sf0.1: one core
    // pinned for 75+ minutes of planning).
    var cur = (0L until 64L).map(i => (i, (i * 7) % 64))
      .toDF("a", "b").transform(Persist.round)
    for (_ <- 1 to 24) {
      cur = cur.alias("l")
        .join(cur.alias("r"), col("l.b") === col("r.a"))
        .select(col("l.a").as("a"), col("r.b").as("b"))
        .limit(64)
        .transform(Persist.round)
    }
    assert(carried(cur) <= BigInt(Long.MaxValue),
      s"round-24 staged frame carries ${carried(cur).bitLength} bits " +
        "of sizeInBytes — the clamp is not applied")
    assert(cur.count() == 64L) // and the tower still executes
    // pass-through: a small frame's checkpoint keeps its TRUE estimate
    // (this is what keeps small staged build sides broadcastable)
    val small = (0L until 10L).map(i => (i, i)).toDF("x", "y")
    val smallCp = small.transform(Persist.round)
    assert(carried(smallCp) > 0 &&
      carried(smallCp) <= BigInt(Long.MaxValue))
    assert(carried(smallCp) < BigInt(1000000),
      s"small staged frame lost its true size: ${carried(smallCp)}")
  }

  test("stats clamp preserves origin constraints (VERDICT r19): a " +
      "clamped stage keeps its inferred not-nulls") {
    def carried(df: org.apache.spark.sql.DataFrame): BigInt =
      df.queryExecution.analyzed.stats.sizeInBytes
    // same tower as above, minus the limit so the join estimate squares
    // cleanly — (i*7)%64 is a bijection mod 64, so the row count stays
    // 64 while the carried estimate overflows within a few rounds
    var cur = (0L until 64L).map(i => (i, (i * 7) % 64))
      .toDF("a", "b").where(col("a").isNotNull)
      .transform(Persist.round)
    var sawClamp = false
    for (_ <- 1 to 6) {
      cur = cur.alias("l")
        .join(cur.alias("r"), col("l.b") === col("r.a"))
        .select(col("l.a").as("a"), col("r.b").as("b"))
        .transform(Persist.round)
      if (carried(cur) == BigInt(Long.MaxValue)) {
        sawClamp = true
        // the clamped REBUILD must carry the origin constraints: the
        // join condition inferred isnotnull on both keys, so the staged
        // output knows its columns are not null — losing that weakens
        // every downstream plan of an already-degenerate stage
        val cons = cur.queryExecution.analyzed.constraints
        assert(cons.nonEmpty,
          "clamped LogicalRDD rebuild dropped the origin constraints")
        assert(cons.exists(_.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.IsNotNull]),
          s"clamped stage lost its not-null constraints: $cons")
      }
    }
    assert(sawClamp,
      "tower never tripped the clamp — the test exercises nothing")
  }

  test("mid-session conf change re-targets the checkpoint dir " +
      "(ADVICE r18)") {
    val edges = (0L until 60L).map(i => (i, (i * 7) % 60))
      .toDF("src", "dst")
    val d1 = java.nio.file.Files.createTempDirectory("graftckpt1")
    val d2 = java.nio.file.Files.createTempDirectory("graftckpt2")
    try {
      spark.conf.set(Persist.CheckpointDirKey, d1.toString)
      Graphs.connectedComponents(edges).collect()
      assert(java.nio.file.Files.walk(d1).count() > 1L,
        s"first dir unused: $d1")
      // flip the conf mid-session: the NEW dir must receive the next
      // rounds (setCheckpointDir makes a UUID child, so comparing
      // against sc.getCheckpointDir could never detect the change)
      spark.conf.set(Persist.CheckpointDirKey, d2.toString)
      Graphs.connectedComponents(edges).collect()
      assert(java.nio.file.Files.walk(d2).count() > 1L,
        s"conf change silently kept staging into the old dir: $d2")
    } finally {
      spark.conf.unset(Persist.CheckpointDirKey)
    }
  }
}
