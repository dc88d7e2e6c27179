package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed gates for the pair-rule statistics and the cap/floor
  * semantics — every count below is verifiable on paper.
  */
class AssociationsSpec extends SparkSpec {
  import spark.implicits._

  // 4 baskets: {a,b,c} {a,b} {a,c} {a} — n=4, c_a=4, c_b=2, c_c=2,
  // c_ab=2, c_ac=2, c_bc=1 (duplicate rows prove presence semantics)
  private val fx = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"), (1L, "a"),
    (2L, "a"), (2L, "b"),
    (3L, "a"), (3L, "c"),
    (4L, "a")).toDF("basket", "item")

  test("pairRules: hand-computed counts, support, confidence, lift") {
    val out = Associations.pairRules(fx, "basket", "item")
      .select("item_a", "item_b", "n_pair", "n_a", "n_b", "n_baskets",
        "support", "conf_a_b", "conf_b_a", "lift")
      .as[(String, String, Long, Long, Long, Long,
        Double, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap

    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = out(("a", "b"))
    assert(ab._3 === 2L && ab._4 === 4L && ab._5 === 2L && ab._6 === 4L)
    assert(ab._7 === 0.5)            // support 2/4
    assert(ab._8 === 0.5)            // conf a->b = 2/4
    assert(ab._9 === 1.0)            // conf b->a = 2/2
    assert(ab._10 === 1.0)           // lift 4*2/(4*2)
    val bc = out(("b", "c"))
    assert(bc._3 === 1L && bc._10 === 1.0) // lift 4*1/(2*2)
  }

  test("pairRules: pmi is the quantized ln of lift") {
    val rows = Associations.pairRules(fx, "basket", "item")
      .select("lift", "pmi_q", "pmi").as[(Double, Long, Double)].collect()
    rows.foreach { case (lift, pmiQ, pmi) =>
      assert(pmiQ === math.round(math.log(lift) * 1e6))
      assert(pmi === pmiQ.toDouble / 1e6)
    }
  }

  test("pairRules: minCount prunes; marginals keep the full universe") {
    val out = Associations.pairRules(fx, "basket", "item", minCount = 2L)
      .select("item_a", "item_b").as[(String, String)].collect().toSet
    assert(out === Set(("a", "b"), ("a", "c"))) // bc co-occurs once
  }

  test("pairRules: maxBasket drops the mega-basket from counts AND marginals") {
    val mega = (1 to 10).map(i => (9L, s"m$i")).toDF("basket", "item")
    val out = Associations.pairRules(fx.unionByName(mega),
      "basket", "item", maxBasket = Some(5))
      .select("item_a", "item_b", "n_baskets")
      .as[(String, String, Long)].collect()
    assert(out.forall(!_._1.startsWith("m")) &&
      out.forall(!_._2.startsWith("m")))
    assert(out.forall(_._3 === 4L)) // basket 9 out of the universe too
  }

  test("topAffinities: both directions, integer pmi rank, k truncation") {
    val rules = Associations.pairRules(fx, "basket", "item")
    val got = Associations.topAffinities(rules, k = 1)
      .select("item", "partner", "confidence", "rank")
      .as[(String, String, Double, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // pmi_q: ab=0 (lift 1), ac=0 (lift 1), bc=0 (lift 1) — all tie at
    // pmi 0; n_pair breaks ab/ac (2) over bc (1); partner asc breaks
    // ab vs ac for item a
    assert(got.keySet == Set("a", "b", "c"))
    assert(got("a") == (("b", 0.5)))       // conf a->b = 2/4
    assert(got("b") == (("a", 1.0)))       // conf b->a = 2/2
    assert(got("c") == (("a", 1.0)))
    val all = Associations.topAffinities(rules, k = 10)
    assert(all.count() == 6L)              // 3 rules × 2 directions
    intercept[IllegalArgumentException](Associations.topAffinities(rules, 0))
  }

  test("pairRules: null basket/item rows are excluded") {
    val withNulls = fx.unionByName(Seq(
      (Option.empty[Long], Option("z")),
      (Option(5L), Option.empty[String])).toDF("basket", "item"))
    val base = Associations.pairRules(fx, "basket", "item")
      .select("item_a", "item_b", "n_pair")
      .as[(String, String, Long)].collect().toSet
    val got = Associations.pairRules(withNulls, "basket", "item")
      .select("item_a", "item_b", "n_pair")
      .as[(String, String, Long)].collect().toSet
    assert(got === base)
  }
}
