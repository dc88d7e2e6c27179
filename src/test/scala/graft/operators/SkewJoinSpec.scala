package graft.operators

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin ≡ plain join (incl. a hot key), deterministic") {
    // hot key 1 carries 80% of the big side
    val big = ((0 until 800).map(i => (1L, s"b$i")) ++
      (0 until 200).map(i => ((i % 5 + 2).toLong, s"c$i"))).toDF("k", "bv")
    val small = Seq((1L, "one"), (2L, "two"), (3L, "three"), (99L, "none"))
      .toDF("k", "sv")
    val plain = big.join(small, "k").select("k", "bv", "sv")
      .as[(Long, String, String)].collect().sorted
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", saltFactor = 8)
      .select("k", "bv", "sv").as[(Long, String, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq)
    // run twice: the salt must be deterministic (no rand())
    val again = SkewJoin.saltedEquiJoin(big, small, "k", saltFactor = 8)
      .select("k", "bv", "sv").as[(Long, String, String)].collect().sorted
    assert(again.toSeq == salted.toSeq)
  }

  test("saltedEquiJoin left join keeps unmatched big-side rows exactly once") {
    val big = Seq((1L, "a"), (7L, "nomatch")).toDF("k", "bv")
    val small = Seq((1L, "one")).toDF("k", "sv")
    val out = SkewJoin.saltedEquiJoin(big, small, "k", 4, "left")
      .select("k", "bv", "sv").as[(Long, String, Option[String])]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a", Some("one")), (7L, "nomatch", None)))
  }

  test("saltedEquiJoin rejects right/full joins (salt would duplicate rows)") {
    val big = Seq((1L, "a")).toDF("k", "bv")
    val small = Seq((2L, "unmatched")).toDF("k", "sv")
    for (jt <- Seq("right", "full", "full_outer")) {
      intercept[IllegalArgumentException] {
        SkewJoin.saltedEquiJoin(big, small, "k", 4, jt)
      }
    }
  }
}
