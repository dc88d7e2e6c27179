package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gates for the record-linkage family: blocking, sorted neighborhood,
  * the distributed global rank, and the entity mapping.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  // (id, name, city, balance): rows 1/2 are a typo pair in the same
  // block, 3 matches 1's name-distance but disagrees on balance, 4 is
  // in another block entirely, 5/6 extend 2 into a transitive chain.
  private lazy val recs = Seq(
    (1L, "ada lovelace", "london", 10.0),
    (2L, "ada lovelaze", "london", 10.0),
    (3L, "ada lovelace", "london", 99.0),
    (4L, "ada lovelace", "paris", 10.0),
    (5L, "ada lovelace", "london", 10.0),
    (6L, "ada lovelaxe", "london", 10.0)
  ).toDF("id", "name", "city", "bal")

  private def verify =
    levenshtein(col("a.name"), col("b.name")) <= 1 &&
      col("a.bal") === col("b.bal")

  test("matchPairs: blocks bound candidates; verify prunes; ids ordered") {
    val pairs = Linkage.matchPairs(recs, "id", Seq("city"), verify)
      .as[(Long, Long)].collect().toSet
    // 3 fails on balance, 4 on the block; all of {1,2,5,6} are within
    // one substitution of each other and share balance → C(4,2) pairs
    assert(pairs == Set((1L, 2L), (1L, 5L), (1L, 6L), (2L, 5L),
      (2L, 6L), (5L, 6L)), s"wrong verified pairs: $pairs")
    // null block keys generate no candidates (SQL join semantics)
    val withNull = recs.unionByName(
      Seq((7L, "ada lovelace", null.asInstanceOf[String], 10.0))
        .toDF("id", "name", "city", "bal"))
    val np = Linkage.matchPairs(withNull, "id", Seq("city"), verify)
      .as[(Long, Long)].collect().toSet
    assert(np == pairs, "a null-block record must stay out of every block")
  }

  test("matchPairs: maxBlock drops the degenerate hot block, keeps the rest") {
    // a hot block: 30 records sharing city "x" with identical names —
    // pure boilerplate, C(30,2) pairs of no linkage value
    val hot = (100L until 130L).map(i => (i, "john smith", "x", 1.0))
      .toDF("id", "name", "city", "bal")
    val both = recs.unionByName(hot)
    val uncapped = Linkage.matchPairs(both, "id", Seq("city"), verify)
      .as[(Long, Long)].collect().toSet
    assert(uncapped.count(p => p._1 >= 100L) == 435, "30*29/2 hot pairs")
    val capped = Linkage.matchPairs(both, "id", Seq("city"), verify,
      maxBlock = 10).as[(Long, Long)].collect().toSet
    assert(capped == uncapped.filter(_._1 < 100L),
      s"cap must drop exactly the hot block: $capped")
  }

  test("globalRank ≡ single-order row_number; unique, dense, 0-based") {
    // 500 rows, skewed sort key (many ties), ranked by (key, id)
    val df = (0L until 500L).map(i => (i, (i * 13 % 7).toString))
      .toDF("id", "k")
    val got = Linkage.globalRank(df, "id", col("k"))
      .select(col("id"), col("__rank")).as[(Long, Long)].collect().toMap
    val expect = (0L until 500L).map(i => (i, (i * 13 % 7).toString))
      .sortBy { case (i, k) => (k, i) }.zipWithIndex
      .map { case ((i, _), r) => i -> r.toLong }.toMap
    assert(got == expect, "distributed rank diverged from the total order")
  }

  test("sortedNeighborhoodPairs: exactly the rank window, each pair once") {
    // ids 0..99 sorted by id; window 5 → pairs at rank distance 1..4
    val df = (0L until 100L).map(i => (i, 1.0)).toDF("id", "bal")
    val pairs = Linkage.sortedNeighborhoodPairs(df, "id", col("id"),
        window = 5, verify = col("a.bal") === col("b.bal"))
      .as[(Long, Long)].collect().toList
    assert(pairs.size == pairs.toSet.size, "a pair must meet exactly once")
    val expect = (for {
      i <- 0L until 100L; j <- i + 1 to math.min(i + 4, 99L)
    } yield (i, j)).toSet
    assert(pairs.toSet == expect, "window membership wrong")
  }

  test("resolveEntities: transitive chain merges; singletons self-map") {
    val pairs = Linkage.matchPairs(recs, "id", Seq("city"), verify)
    val m = Linkage.resolveEntities(recs, "id", pairs)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // 1-2-5-6 chain collapses to entity 1 (6 only matches 2, distance 1
    // via the z/x substitution — transitivity carries it in)
    assert(Seq(1L, 2L, 5L, 6L).forall(m(_) == ((1L, 4L))), s"chain: $m")
    assert(m(3L) == ((3L, 1L)) && m(4L) == ((4L, 1L)), s"singletons: $m")
  }

  test("fsWeightedPairs: three bands, hand-computed weights, guards") {
    // one block; weights: name agree +log2(95), disagree +log2(5/99);
    // bal agree +log2(90/1), disagree +log2(10/99.99)
    val df = Seq(
      (1L, "ada lovelace", "x", 10.0),
      (2L, "ada lovelaze", "x", 10.0), // full agreement → match
      (3L, "xxx yyyyyyyy", "x", 10.0), // name disagrees → possible
      (4L, "ada lovelace", "x", 99.0)  // bal disagrees → non_match
    ).toDF("id", "name", "city", "bal")
    val fields = Seq(
      (levenshtein(col("a.name"), col("b.name")) <= 1, 0.95, 0.01),
      (col("a.bal") === col("b.bal"), 0.9, 0.0001))
    val got = Linkage.fsWeightedPairs(df, "id", Seq("city"), fields,
        upper = 15.0, lower = 5.0)
      .as[(Long, Long, Double, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    def lg(x: Double) = math.log(x) / math.log(2.0)
    val nameA = lg(0.95 / 0.01); val nameD = lg((1.0 - 0.95) / 0.99)
    val balA = lg(0.9 / 0.0001); val balD = lg((1.0 - 0.9) / 0.9999)
    assert(got.size == 6, s"all blocked pairs must band: $got")
    assert(got((1L, 2L))._2 == "match" &&
      math.abs(got((1L, 2L))._1 - (nameA + balA)) < 1e-9)
    assert(got((1L, 3L))._2 == "possible" &&
      math.abs(got((1L, 3L))._1 - (nameD + balA)) < 1e-9)
    assert(got((1L, 4L))._2 == "non_match" &&
      math.abs(got((1L, 4L))._1 - (nameA + balD)) < 1e-9)
    // feeding the match band to resolveEntities ≡ the boolean pipeline
    val viaBands = Linkage.resolveEntities(df, "id",
      Linkage.fsWeightedPairs(df, "id", Seq("city"), fields, 15.0, 5.0)
        .filter(col("band") === "match").select(col("doc_a"), col("doc_b")))
      .as[(Long, Long, Long)].collect().toSet
    val viaBool = Linkage.resolveEntities(df, "id",
      Linkage.matchPairs(df, "id", Seq("city"),
        levenshtein(col("a.name"), col("b.name")) <= 1 &&
          col("a.bal") === col("b.bal")))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaBands == viaBool, "match band must reproduce the boolean pipeline")
    intercept[IllegalArgumentException] {
      Linkage.fsWeightedPairs(df, "id", Seq("city"),
        Seq((col("a.bal") === col("b.bal"), 0.2, 0.5)), 1.0, 0.0)
    }
  }

  test("incrementalResolve: stored join, cluster propagation, new entities") {
    val stored = Seq(
      (1L, "ada lovelace", "london", 10.0, 1L),
      (2L, "ada lovelaze", "london", 10.0, 1L),
      (3L, "grace hopper", "london", 5.0, 3L)
    ).toDF("id", "name", "city", "bal", "entity_id")
    val fresh = Seq(
      (10L, "ada lovelacq", "london", 10.0), // 1 sub from stored 1
      (11L, "alan turing", "london", 7.0),   // stranger
      (12L, "grace hoppex", "london", 5.0),  // 1 sub from stored 3
      (13L, "grace hoppxx", "london", 5.0),  // 2 subs from stored 3 (no
      // direct match) but 1 sub from 12 — rule 2 must carry entity 3 in
      (14L, "mary shellex", "london", 3.0),  // unseen twins: one new
      (15L, "mary shelley", "london", 3.0)   // entity for both
    ).toDF("id", "name", "city", "bal")
    val got = Linkage.incrementalResolve(stored, fresh, "id", "entity_id",
        Seq("city"), verify)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      10L -> ((1L, true)), 11L -> ((11L, false)),
      12L -> ((3L, true)), 13L -> ((3L, true)),
      14L -> ((14L, false)), 15L -> ((14L, false))), s"wrong: $got")
  }

  test("planted-fixture edit distances are what the gates assume") {
    // the q185/q187 perturbations: 1-sub, 2-sub, 4-sub on a name tail
    val d = Seq(("Customer#000000003", "Customer#00000000X"),
      ("Customer#000000007", "Customer#0000000XY"),
      ("Customer#000000011", "Customer#00000WXYZ"))
      .toDF("x", "y").select(levenshtein(col("x"), col("y")))
      .as[Int].collect().toSeq
    assert(d == Seq(1, 2, 4), s"edit distances drifted: $d")
  }
}
