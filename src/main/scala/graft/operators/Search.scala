package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval: a stored inverted index + Okapi BM25 scoring
  * (Robertson & Walker, SIGIR'94; the k1/b parameterization and the
  * +1-inside-the-log idf follow the Lucene practical variant, which
  * keeps idf positive for terms in more than half the corpus).
  *
  * This is the sparse sibling of the dense ANN family
  * ([[Similarity]]): the reference corpus is indexed ONCE into a
  * postings table, and query batches score against the index without
  * ever touching document text. Beside `documents`-table analytics it
  * is the retrieval half of a dedup/decontamination triage UI ("show me
  * the docs that match this benchmark prompt").
  *
  * Scale shape (100 TB posture):
  *  - [[textIndex]] is one exploded scan with a map-side-combined
  *    (doc, term) count; document text never shuffles — the tokens do,
  *    already reduced to (term, tf) pairs.
  *  - [[bm25TopK]] joins QUERY terms (metadata-sized: queries × a few
  *    terms each) to the postings on the term key via broadcast, so
  *    the big side is scanned once and never re-partitioned; the
  *    (query, doc) score aggregate and per-query top-k window group by
  *    query — group size is bounded by matched postings, and the
  *    rank window partitions by query, never the corpus.
  *  - Corpus stats (N, avgdl) are a doc-cardinality aggregate reduced
  *    to ONE row and broadcast — no driver-side count.
  *
  * Determinism contract (the q151 quantized-contribution discipline):
  * each (query, term, doc) score contribution is a single double
  * expression — idf(term) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) —
  * quantized to 1e-9-granular longs BEFORE the per-(query, doc) sum,
  * so partition order / engine / retry cannot move a score by an ulp;
  * the final score is one long/1e9 division (exact, 1e9 is
  * representable) and ranking orders by the LONG, so no float boundary
  * decides the top-k. Contributions are ≤ ~ln(N)·(k1+1) ≈ a few tens,
  * so the per-doc quantized sum stays far inside long range even for
  * thousand-term queries.
  */
object Search {

  /** Inverted index over a document frame: one row per (term, doc)
    * with the term frequency and the document token length —
    * `(term, <idCol>, tf, dl)`. Stored once, queried many times;
    * rebuilding is one corpus scan.
    */
  def textIndex(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      // dl rides the explode as a per-row constant (functionally
      // dependent on the doc id), so the index needs exactly ONE
      // shuffle — the (term, doc) count — not a second doc-keyed
      // window pass to recover document length afterwards
      .select(col(idCol), size(col("__t")).cast("long").as("dl"),
        explode(col("__t")).as("term"))
      .groupBy(col("term"), col(idCol), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .select(col("term"), col(idCol), col("tf"), col("dl"))

  /** BM25 top-k retrieval of `k` documents per query from a stored
    * [[textIndex]]. `queries` carries `(qidCol, qtextCol)`; its text
    * tokenizes with the same whitespace rule as the index and DISTINCT
    * query terms each contribute once (binary query-side tf, the
    * standard short-query convention). Queries with no indexed term
    * return no rows. Ties rank deterministically by (score desc,
    * doc asc) on the quantized long score.
    */
  def bm25TopK(index: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75, idCol: String = "doc_id",
      qidCol: String = "query_id",
      qtextCol: String = "query_text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(k1 >= 0 && b >= 0 && b <= 1,
      s"need k1 >= 0 and 0 <= b <= 1, got k1=$k1 b=$b")
    // corpus stats: doc-cardinality aggregate -> ONE row, broadcast
    val stats = index.groupBy(col(idCol)).agg(first(col("dl")).as("__dl"))
      .agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__sumdl"))
    val df = index.groupBy(col("term"))
      .agg(count(lit(1)).as("__df"))
    val qterms = queries
      .select(col(qidCol),
        explode(TextAnalysis.tokens(col(qtextCol))).as("term"))
      .distinct()
    val avgdl = col("__sumdl").cast("double") / col("__n").cast("double")
    val idf = log(lit(1.0) +
      (col("__n").cast("double") - col("__df").cast("double") + lit(0.5)) /
        (col("__df").cast("double") + lit(0.5)))
    val tfn = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("score_q").desc, col(idCol).asc)
    index
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__cq", round(idf * tfn * lit(1e9)).cast("long"))
      .groupBy(col(qidCol), col(idCol))
      .agg(sum(col("__cq")).as("score_q"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("score", col("score_q").cast("double") / lit(1e9))
      .select(col(qidCol), col(idCol), col("score_q"), col("score"),
        col("rank"))
  }
}
