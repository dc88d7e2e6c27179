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
}
