package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def mk(n: Int, entities: Int) =
    (0 until n).map(i => (i % entities, i.toLong, (i * 7 % 13).toDouble))
      .toDF("e", "seq", "v")

  test("saltedRollingAvg ≡ plain rollingAvg (chunk boundaries patched)") {
    val df = mk(200, 3)
    val plain = Windows.rollingAvg(df, "e", Seq($"seq"), "v", 7, "ra")
      .select("e", "seq", "ra").as[(Int, Long, Double)].collect().sorted
    val salted = Windows.saltedRollingAvg(df, "e", Seq($"seq"), "v", 7, "ra",
        chunkSize = 10)
      .select("e", "seq", "ra").as[(Int, Long, Double)].collect().sorted
    assert(salted.length == plain.length)
    plain.zip(salted).foreach { case ((pe, ps, pv), (se, ss, sv)) =>
      assert(pe == se && ps == ss && math.abs(pv - sv) < 1e-9,
        s"mismatch at ($pe,$ps): $pv vs $sv")
    }
  }

  test("saltedRollingAvg ≡ plain rollingAvg with nulls at chunk boundaries") {
    // rows whose local (within-chunk) window is ALL NULL: the boundary
    // formula must coalesce the null local sum instead of poisoning the
    // patched average, and an all-null combined frame must yield null —
    // matching the plain window's avg semantics exactly
    val df = (0 until 60).map { i =>
      val v: Option[Double] =
        if (i % 10 <= 2) None else Some((i * 7 % 13).toDouble)
      (1, i.toLong, v)
    }.toDF("e", "seq", "v")
    val plain = Windows.rollingAvg(df, "e", Seq($"seq"), "v", 4, "ra")
      .select("seq", "ra").as[(Long, Option[Double])].collect().toMap
    val salted = Windows.saltedRollingAvg(df, "e", Seq($"seq"), "v", 4, "ra",
        chunkSize = 10)
      .select("seq", "ra").as[(Long, Option[Double])].collect().toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (s, pv) =>
      (pv, salted(s)) match {
        case (None, None) =>
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"seq $s")
        case other => fail(s"null-pattern mismatch at seq $s: $other")
      }
    }
  }

  test("saltedRollingAvg: chunkSize < frame is rejected") {
    intercept[IllegalArgumentException] {
      Windows.saltedRollingAvg(mk(10, 1), "e", Seq($"seq"), "v", 7, "ra",
        chunkSize = 3)
    }
  }

  test("sessionize: gap over threshold starts a new session, per entity") {
    // entity 1: times 0,10,15 | 100,105 | 300  (maxGap = 20)
    // entity 2: times 0, 25                    (25 > 20 → two sessions)
    val df = Seq((1, 0L), (1, 10L), (1, 15L), (1, 100L), (1, 105L),
      (1, 300L), (2, 0L), (2, 25L))
      .toDF("e", "t")
    val out = Windows.sessionize(df, "e", Seq($"t"), "t", maxGap = 20L)
      .select("e", "t", "session_idx").as[(Int, Long, Long)].collect().toSet
    assert(out == Set((1, 0L, 1L), (1, 10L, 1L), (1, 15L, 1L),
      (1, 100L, 2L), (1, 105L, 2L), (1, 300L, 3L),
      (2, 0L, 1L), (2, 25L, 2L)))
  }

  test("sessionize: gap exactly at maxGap stays in the session") {
    val df = Seq((1, 0L), (1, 20L)).toDF("e", "t")
    val out = Windows.sessionize(df, "e", Seq($"t"), "t", maxGap = 20L)
      .select("session_idx").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("sessionize plan: lag and running sum share ONE shuffle") {
    val plan = Windows.sessionize(mk(50, 3), "e", Seq($"seq"), "seq", 5L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"both windows must reuse one entity-keyed exchange:\n$plan")
  }
}
