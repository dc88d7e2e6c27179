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

  test("saltedRollingAvg: chunkSize < frame is rejected") {
    intercept[IllegalArgumentException] {
      Windows.saltedRollingAvg(mk(10, 1), "e", Seq($"seq"), "v", 7, "ra",
        chunkSize = 3)
    }
  }
}
