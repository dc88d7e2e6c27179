package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed RFM gates: 8 customers engineered so every quartile
  * cutpoint and band assignment is checkable on paper, plus the
  * tie-to-lower-band and exact-cents contracts.
  */
class SegmentationSpec extends SparkSpec {
  import spark.implicits._

  // customer c1..c8: one order each on 2024-01-0d (d = customer index)
  // → recency spreads 8 distinct values; frequency all 1 (degenerate
  // metric: every customer ties at the only value); amounts ascend so
  // monetary quartiles mirror the index.
  private val orders = (1 to 8).map { i =>
    (s"c$i", s"2024-01-0$i", i * 10.0 + 0.01)
  }.toDF("cust", "d", "amt")

  private def run() =
    Segmentation.rfmSegments(orders, "cust", "d", "amt", lit("2024-01-31"))
      .select("customer", "recency_days", "frequency", "monetary_q",
        "r_score", "f_score", "m_score", "segment")
      .as[(String, Long, Long, Long, Int, Int, Int, String)]
      .collect().map(r => r._1 -> r).toMap

  test("rfm: recency/monetary quartile scores on 8 evenly spread customers") {
    val out = run()
    // recency_days: c8=23 .. c1=30; percentile_disc cuts at the 2nd,
    // 4th, 6th values ascending (24, 26, 28) → c8,c7 get 4; c6,c5 → 3;
    // c4,c3 → 2; c2,c1 → 1. Monetary ascends with index: c1,c2 → 1 …
    // c7,c8 → 4.
    assert(out("c8")._5 === 4 && out("c7")._5 === 4)
    assert(out("c6")._5 === 3 && out("c5")._5 === 3)
    assert(out("c4")._5 === 2 && out("c3")._5 === 2)
    assert(out("c2")._5 === 1 && out("c1")._5 === 1)
    assert(out("c1")._7 === 1 && out("c2")._7 === 1)
    assert(out("c7")._7 === 4 && out("c8")._7 === 4)
    assert(out("c8")._2 === 23L && out("c1")._2 === 30L)
  }

  test("rfm: a degenerate metric (all ties) lands everyone in the lowest band") {
    val out = run()
    // every frequency = 1 = every cutpoint → `<= c25` catches all
    assert(out.values.forall(_._6 === 1))
  }

  test("rfm: monetary is exact cents; segment concatenates the digits") {
    val out = run()
    assert(out("c3")._4 === 3001L) // 30.01 → 3001 cents
    out.values.foreach { r =>
      assert(r._8 === s"${r._5}${r._6}${r._7}")
    }
  }

  test("rfm: multi-order customers aggregate before scoring") {
    val multi = orders.unionByName(
      Seq(("c1", "2024-01-30", 999.99)).toDF("cust", "d", "amt"))
    val out = Segmentation.rfmSegments(multi, "cust", "d", "amt",
        lit("2024-01-31"))
      .select("customer", "recency_days", "frequency", "monetary_q")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out("c1")._2 === 1L)      // most recent order wins recency
    assert(out("c1")._3 === 2L)
    assert(out("c1")._4 === 1001L + 99999L)
  }
}
