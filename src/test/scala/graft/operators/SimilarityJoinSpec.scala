package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exactness gates for the prefix-filtered set-similarity join: the
  * operator must agree PAIR FOR PAIR with a brute-force all-pairs
  * reference (the property the prefix filter is not allowed to trade).
  */
class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(sets: Map[Long, Set[String]], t: Double)
      : Map[(Long, Long), (Long, Long)] = {
    val tPpm = math.round(t * 1e6)
    val ids = sets.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      inter = (sets(i) & sets(j)).size.toLong
      union = (sets(i) | sets(j)).size.toLong
      if inter * (1000000L + tPpm) >= tPpm * (union + inter)
    } yield (i, j) -> ((inter, union))).toMap
  }

  private def run(rows: Seq[(Long, Seq[String])], t: Double)
      : Map[(Long, Long), (Long, Long)] =
    SimilarityJoin.setSimilarityJoin(
        rows.toDF("id", "s"), "id", "s", t)
      .select("doc_a", "doc_b", "n_inter", "n_union")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (a, b, i, u) => (a, b) -> ((i, u)) }.toMap

  // a fixture exercising the filter's edge geometry: near-identical
  // pair, subset pair, disjoint sets, a universal hot token, a
  // singleton, and skewed sizes around the length filter's boundary
  private val fx: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("a", "b", "c", "d", "e"),
    2L -> Seq("a", "b", "c", "d", "f"),          // J(1,2) = 4/6
    3L -> Seq("a", "b", "c", "d", "e"),          // J(1,3) = 1 exact dup
    4L -> Seq("x", "y", "z"),                    // disjoint from 1-3
    5L -> Seq("a"),                              // singleton, hot token
    6L -> Seq("a", "b"),                         // J(5,6) = 1/2
    7L -> Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j"),
    8L -> Seq("q", "q", "r"))                    // dup elements collapse

  test("setSimilarityJoin ≡ brute force across thresholds") {
    val setsOf = fx.map { case (i, s) => i -> s.toSet }.toMap
    for (t <- Seq(0.3, 0.5, 0.6667, 0.8, 1.0)) {
      val got = run(fx, t)
      val want = brute(setsOf, t)
      assert(got == want, s"t=$t: got $got want $want")
    }
    // the fixture is non-trivial at every tested threshold shape
    assert(brute(setsOf, 0.3).nonEmpty && brute(setsOf, 1.0).size == 1)
  }

  test("setSimilarityJoin: boundary pairs land exactly on the threshold") {
    // J(1,2) = 4/6 = 0.6667√≠: at t = 2/3 the ppm test must KEEP it
    // (4 * (1e6 + 666667) < 666667 * 10 → check the exact arithmetic
    // matches brute force rather than hand-asserting the rounding)
    val setsOf = fx.map { case (i, s) => i -> s.toSet }.toMap
    val t = 2.0 / 3.0
    assert(run(fx, t) == brute(setsOf, t))
    // jaccard output column is i/u rounded to 4
    val j = SimilarityJoin.setSimilarityJoin(
        fx.toDF("id", "s"), "id", "s", 0.3)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().map { case (a, b, v) => (a, b) -> v }.toMap
    assert(j((1L, 2L)) == 0.6667 && j((1L, 3L)) == 1.0)
  }

  test("setSimilarityJoin: empty/null sets dropped, guards") {
    val withEmpty = Seq(
      (1L, Seq("a", "b")), (2L, Seq("a", "b")), (3L, Seq.empty[String]))
      .toDF("id", "s")
      .unionByName(Seq(4L).toDF("id")
        .withColumn("s", lit(null).cast("array<string>")))
    val got = SimilarityJoin.setSimilarityJoin(withEmpty, "id", "s", 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)), s"empty/null sets must join nothing: $got")
    intercept[IllegalArgumentException] {
      SimilarityJoin.setSimilarityJoin(withEmpty, "id", "s", 0.0)
    }
    intercept[IllegalArgumentException] {
      SimilarityJoin.setSimilarityJoin(withEmpty, "id", "s", 1.1)
    }
  }

  test("setSimilarityJoin ≡ brute force on a randomized corpus") {
    // deterministic pseudo-random sets over a small alphabet — dense
    // overlap structure, the prefix filter's worst case
    val rng = new scala.util.Random(7)
    val corpus = (1L to 60L).map { i =>
      i -> (0 until (2 + rng.nextInt(8)))
        .map(_ => s"t${rng.nextInt(12)}").distinct
    }
    val setsOf = corpus.map { case (i, s) => i -> s.toSet }.toMap
    for (t <- Seq(0.4, 0.7)) {
      assert(run(corpus, t) == brute(setsOf, t), s"t=$t")
    }
  }
}
