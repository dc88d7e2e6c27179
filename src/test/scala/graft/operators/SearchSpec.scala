package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed BM25 gates for the lexical-retrieval family. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs with known tf/dl structure; "rare" appears only in d3,
  // "common" in 3 of 4 docs (df > N/2 — the Lucene +1 idf branch
  // must stay positive there).
  private lazy val docs = Seq(
    (1L, "common alpha alpha beta"),
    (2L, "common beta"),
    (3L, "common rare rare rare"),
    (4L, "alpha beta gamma delta"))
    .toDF("doc_id", "text")

  private def refBm25(qTerms: Seq[String]): Map[Long, Long] = {
    val corpus = Map(
      1L -> Seq("common", "alpha", "alpha", "beta"),
      2L -> Seq("common", "beta"),
      3L -> Seq("common", "rare", "rare", "rare"),
      4L -> Seq("alpha", "beta", "gamma", "delta"))
    val n = corpus.size.toDouble
    val avgdl = corpus.values.map(_.size).sum.toDouble / n
    val dfm = corpus.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toDouble }
    val (k1, b) = (1.2, 0.75)
    corpus.flatMap { case (id, toks) =>
      val score = qTerms.distinct.flatMap { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0 || !dfm.contains(t)) None
        else {
          val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
          val tfn = tf * (k1 + 1.0) /
            (tf + k1 * (1.0 - b + b * toks.size.toDouble / avgdl))
          Some(math.rint(idf * tfn * 1e9 + 0.0).toLong)
        }
      }.sum
      if (score == 0 && qTerms.forall(t => !toks.contains(t))) None
      else Some(id -> score)
    }
  }

  private lazy val idx = Search.textIndex(docs)

  test("textIndex: tf, dl, and postings shape") {
    val rows = idx.as[(String, Long, Long, Long)].collect().toSet
    assert(rows.contains(("alpha", 1L, 2L, 4L)))
    assert(rows.contains(("rare", 3L, 3L, 4L)))
    assert(rows.contains(("common", 2L, 1L, 2L)))
    // one posting per (term, doc); dl constant per doc
    assert(rows.size == rows.map(r => (r._1, r._2)).size)
    assert(rows.groupBy(_._2).forall(_._2.map(_._4).size == 1))
  }

  test("bm25TopK ≡ hand-computed quantized scores; rank order exact") {
    val qs = Seq((10L, "rare common")).toDF("query_id", "query_text")
    val got = Search.bm25TopK(idx, qs, k = 10)
      .select(col("doc_id"), col("score_q"), col("rank"))
      .as[(Long, Long, Int)].collect()
    val ref = refBm25(Seq("rare", "common"))
    assert(got.map(r => r._1 -> r._2).toMap == ref,
      s"scores diverged: got ${got.toSeq} want $ref")
    // d3 carries the only "rare" postings -> must rank first
    assert(got.find(_._3 == 1).get._1 == 3L)
    // ranks are 1..n with ties broken by doc asc on equal score_q
    val sorted = got.sortBy(r => (-r._2, r._1)).map(_._1).toSeq
    assert(got.sortBy(_._3).map(_._1).toSeq == sorted)
  }

  test("df>N/2 term keeps a positive idf (Lucene +1 branch)") {
    val qs = Seq((1L, "common")).toDF("query_id", "query_text")
    val got = Search.bm25TopK(idx, qs, k = 10)
    assert(got.count() == 3)
    assert(got.agg(min(col("score_q"))).head.getLong(0) > 0)
  }

  test("absent-term query contributes nothing; k truncates") {
    val qs = Seq((1L, "zzz alpha"), (2L, "zzz")).toDF(
      "query_id", "query_text")
    val got = Search.bm25TopK(idx, qs, k = 1)
      .select(col("query_id"), col("doc_id"))
      .as[(Long, Long)].collect()
    // q2 matches nothing; q1 keeps exactly its single best doc
    assert(got.length == 1 && got.head._1 == 1L)
  }

  test("guards fail loudly") {
    val qs = Seq((1L, "alpha")).toDF("query_id", "query_text")
    intercept[IllegalArgumentException](Search.bm25TopK(idx, qs, k = 0))
    intercept[IllegalArgumentException](
      Search.bm25TopK(idx, qs, k = 1, b = 1.5))
  }

  test("shingleIndex: multiplicity kept, whole-text fallback, dl = shingle count") {
    // "x y x y x" → 2-shingles: "x y","y x","x y" — tf("x y")=2
    val d = Seq((1L, "x y x y x"), (2L, "solo")).toDF("doc_id", "text")
    val got = Search.shingleIndex(d, n = 2)
      .select("term", "doc_id", "tf", "dl")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(
      ("x y", 1L, 2L, 4L), ("y x", 1L, 2L, 4L),
      ("solo", 2L, 1L, 1L)), s"got $got")
  }

  test("tfidfCosinePairs: hand-computed cosine on a 3-doc space") {
    // unigram-style index via n=1 shingles; N=3, dfs: a=3, b=2, c=1
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val index = Search.shingleIndex(d, n = 1)
    val got = Search.tfidfCosinePairs(index, 0.01)
      .select("doc_a", "doc_b", "dot_q", "cosine")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val wa = math.round(math.log(1.0 + 3.0 / 3.0) * 1000) // idf_q(a)
    val wb = math.round(math.log(1.0 + 3.0 / 2.0) * 1000)
    val wc = math.round(math.log(1.0 + 3.0 / 1.0) * 1000)
    val n12 = wa * wa + wb * wb
    val n3 = wa * wa + wc * wc
    def cos(dot: Long, na: Long, nb: Long): Double =
      math.floor(dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
        * 1e4 + 0.5) / 1e4
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got((1L, 2L)) == ((wa * wa + wb * wb, 1.0)))
    assert(got((1L, 3L))._1 == wa * wa)
    assert(got((1L, 3L))._2 == cos(wa * wa, n12, n3))
  }

  test("topKeywords: integer rank, rare term outranks frequent common term") {
    // d1: "common" tf=3 (df 2), "rare" tf=1 (df 1) over N=2 docs:
    // idf_q(common)=round(ln(2)*1000)=693, idf_q(rare)=round(ln(3)*1000)
    // =1099 → w(common)=2079 > w(rare)=1099 — tf buys rank here; k=1
    // keeps only common. A second doc shares "common" only.
    val d = Seq((1L, "common common common rare"), (2L, "common x"))
      .toDF("doc_id", "text")
    val index = Search.shingleIndex(d, n = 1)
    val got = Search.topKeywords(index, k = 1)
      .select("doc_id", "term", "w_q", "rank")
      .as[(Long, String, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == (("common", 3 * 693L, 1)))
    val all = Search.topKeywords(index, k = 10)
      .select("doc_id", "term", "w_q")
      .as[(Long, String, Long)].collect()
    assert(all.filter(_._1 == 1L).map(_._2).toSet == Set("common", "rare"))
    assert(all.find(r => r._1 == 1L && r._2 == "rare").get._3 == 1099L)
    intercept[IllegalArgumentException](Search.topKeywords(index, 0))
  }

  test("tfidfCosinePairs: maxDf removes hot dimensions from the whole space") {
    // with df(a)=3 pruned at maxDf=2, docs 1/2 keep only b (cosine 1),
    // and doc 3 shares no surviving term with them
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val index = Search.shingleIndex(d, n = 1)
    val got = Search.tfidfCosinePairs(index, 0.01, maxDf = Some(2L))
      .select("doc_a", "doc_b", "cosine")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map((1L, 2L) -> 1.0), s"got $got")
    intercept[IllegalArgumentException](
      Search.tfidfCosinePairs(index, 1.5))
  }

  test("rrfFuse: quantized reciprocal-rank sums, single-list docs, " +
      "ties to the low id, k truncation") {
    def c(r: Int): Long = math.rint(1e9 / (60.0 + r)).toLong
    // query 1: doc 10 in both systems (rank 1 + rank 2), docs 20/30
    // only in A, doc 40 only in B; query 2: a pure rrf_q tie (both at
    // rank 1 in one system each) must order by doc id.
    val sysA = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3), (2L, 5L, 1))
      .toDF("query_id", "doc_id", "rank")
    val sysB = Seq((1L, 10L, 2), (1L, 40L, 1), (2L, 3L, 1))
      .toDF("query_id", "doc_id", "rank")
    val out = Search.rrfFuse(Seq(sysA, sysB), k = 10)
      .select("query_id", "doc_id", "rrf_q", "n_systems", "fused_rank")
      .as[(Long, Long, Long, Long, Int)].collect()
    val q1 = out.filter(_._1 == 1L).sortBy(_._5)
    assert(q1.map(r => (r._2, r._3, r._4)).toSeq == Seq(
      (10L, c(1) + c(2), 2L), // fused vote beats either single list
      (40L, c(1), 1L),        // B's rank-1 beats A's rank-2
      (20L, c(2), 1L),
      (30L, c(3), 1L)), s"got ${q1.toSeq}")
    val q2 = out.filter(_._1 == 2L).sortBy(_._5)
    assert(q2.map(_._2).toSeq == Seq(3L, 5L), "rrf_q tie breaks to low id")
    // k truncation keeps the TOP of the fused order
    val top2 = Search.rrfFuse(Seq(sysA, sysB), k = 2)
      .filter($"query_id" === 1L).select("doc_id")
      .as[Long].collect().toSet
    assert(top2 == Set(10L, 40L))
    intercept[IllegalArgumentException](Search.rrfFuse(Nil, 5))
    intercept[IllegalArgumentException](Search.rrfFuse(Seq(sysA), 0))
    intercept[IllegalArgumentException](Search.rrfFuse(Seq(sysA), 5, -1))
  }
}
