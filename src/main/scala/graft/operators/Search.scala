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

  /** [[textIndex]] over word n-gram shingles instead of unigrams —
    * same `(term, <idCol>, tf, dl)` schema, `term` = space-joined
    * n-gram, `tf` = how many sliding positions produced it, `dl` = the
    * document's total shingle count. This is the index to build when
    * the unigram vocabulary is too small to discriminate (boilerplate-
    * heavy corpora collapse to a few hundred words; their 3-shingle
    * space stays sparse) — the same reason [[Dedup]]'s similarity
    * family shingles before hashing. Tokenization and the shorter-
    * than-n whole-text fallback match [[Dedup.wordShingles]] exactly;
    * multiplicity is kept (the codegen'd
    * [[graft.functions.AllWordShinglesExpr]], one text walk per row).
    */
  def shingleIndex(docs: DataFrame, n: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol),
        graft.functions.ShingleFunctions.wordShinglesAll(col(textCol), n)
          .as("__t"))
      .select(col(idCol), size(col("__t")).cast("long").as("dl"),
        explode(col("__t")).as("term"))
      .groupBy(col("term"), col(idCol), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .select(col("term"), col(idCol), col("tf"), col("dl"))

  /** Top-k keyword extraction: each document's `k` highest-tf-idf
    * terms from a stored [[textIndex]]/[[shingleIndex]] — the
    * unsupervised doc-tagging / search-facet / "what is this page
    * about" primitive (the tf-idf keyword baseline every extraction
    * paper benchmarks against). This is the INDEX-side sibling of
    * [[TextAnalysis.tfidfTopTerms]] (which scans raw text with the
    * classic ln(N/df) weight): here the corpus is never rescanned —
    * the stored postings are the input, the term space is whatever the
    * index was built over (shingles included), and the weight is the
    * [[tfidfCosinePairs]] quantization EXACTLY (w_q = tf ·
    * round(ln(1 + N/df)·idfScale) longs) so keyword ranks and cosine
    * pairs come from ONE consistent vector space. Ranking compares
    * integers — ties break (w_q desc, term asc), fully deterministic.
    *
    * Scale shape: two aggregates over the index (df table joined back
    * at the term key, N one broadcast row) and ONE rank window
    * partitioned by document — group size = the doc's distinct-term
    * count, never the corpus. Document text is never touched (the
    * index is the input).
    *
    * @return (<idCol>, term, tf, w_q, rank), rank 1..k per document
    */
  def topKeywords(index: DataFrame, k: Int, idCol: String = "doc_id",
      idfScale: Long = 1000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(idfScale >= 1, s"idfScale must be >= 1, got $idfScale")
    val stats = index.groupBy(col(idCol)).agg(count(lit(1)).as("__one"))
      .agg(count(lit(1)).as("__n"))
    val dfTab = index.groupBy(col("term"))
      .agg(count(lit(1)).as("__df"))
    val idfQ = round(log(lit(1.0) +
      col("__n").cast("double") / col("__df").cast("double")) *
      lit(idfScale.toDouble)).cast("long")
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("w_q").desc, col("term").asc)
    index.join(dfTab, Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("w_q", col("tf") * idfQ)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("w_q"), col("rank"))
  }

  /** All document pairs with tf-idf cosine similarity ≥ `threshold`,
    * from a stored [[textIndex]]/[[shingleIndex]] — the WEIGHTED
    * complement of [[SimilarityJoin.setSimilarityJoin]] (Jaccard treats
    * every shared term equally; cosine lets rare terms dominate, the
    * Salton vector-space convention) and the sparse-lexical complement
    * of [[Similarity]]'s dense-embedding pair ops.
    *
    * Weights: w(t,d) = tf · idf_q(t), idf_q = round(ln(1 + N/df)·10³)
    * — idf quantized to 1e-3 BEFORE the multiply, so w is an exact
    * long, ‖d‖² = Σw² an exact long sum (order-free), each pair dot
    * Σ wₐ·w_b an exact long sum, and cosine ONE double expression
    * dot/√(‖a‖²·‖b‖²) over exact integers — bit-replayable by any
    * engine, no distributed float sum (the q151 discipline). Long
    * bounds: safe while tf·idf_q ≤ ~3·10⁷ and ≤ ~10⁴ distinct terms
    * per doc (Σw² < 2⁶³); a corpus beyond that drops `idfScale` a
    * decade.
    *
    * Scale shape (100 TB posture):
    *  - Candidate enumeration self-joins the index at the TERM key:
    *    work is Σ df(t)² — viable exactly when the vocabulary is
    *    discriminative (the [[shingleIndex]] regime). `maxDf` removes
    *    dimensions hotter than the cap from the vector space ENTIRELY
    *    (weights, norms, and candidates — a DOCUMENTED semantic:
    *    "cosine over the ≤ maxDf vocabulary", the df-cut every sparse
    *    all-pairs system applies (Elsayed, Lin & Oard, ACL'08), not a
    *    silent drop: ubiquitous terms carry ~zero idf weight but
    *    quadratic join cost).
    *  - Shuffled payloads are (term, id, w_q) and (id, id, dot) —
    *    document text never moves; norms join on the pair's own id
    *    keys (doc-cardinality, deliberately NOT broadcast).
    *  - N and the df table compute from the index itself — one
    *    aggregate each, no second corpus scan.
    *
    * @return (doc_a, doc_b, dot_q, cosine), doc_a < doc_b, every pair
    *         with cosine ≥ threshold over the (df ≤ maxDf) vocabulary
    */
  def tfidfCosinePairs(index: DataFrame, threshold: Double,
      idCol: String = "doc_id", maxDf: Option[Long] = None,
      idfScale: Long = 1000L): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"threshold must be in (0, 1], got $threshold")
    require(idfScale >= 1, s"idfScale must be >= 1, got $idfScale")
    // N = docs in the WHOLE index: pruning a dimension shrinks
    // vectors, not the corpus idf is measured against
    val stats = index.groupBy(col(idCol)).agg(count(lit(1)).as("__one"))
      .agg(count(lit(1)).as("__n"))
    val dfTab = index.groupBy(col("term"))
      .agg(count(lit(1)).as("__df"))
    val dfKept = maxDf match {
      case None => dfTab
      case Some(cap) => dfTab.where(col("__df") <= cap)
    }
    val idfQ = round(log(lit(1.0) +
      col("__n").cast("double") / col("__df").cast("double")) *
      lit(idfScale.toDouble)).cast("long")
    // the weighted postings feed the norm aggregate AND both self-join
    // sides — materialize ONCE (round 22; the q238 repeated-branch
    // discipline): without this each of the three reads re-derived the
    // index pipeline (for an inline-built shingle index, a full
    // shingling + (term, doc) shuffle per read). Narrow (term, id, w_q)
    // rows — the operator's own documented shuffle payload.
    val w = index.join(dfKept, Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("term"), col(idCol).as("id"),
        (col("tf") * idfQ).as("__w"))
      .transform(Persist.round)
    val norms = w.groupBy(col("id"))
      .agg(sum(col("__w") * col("__w")).as("__norm2"))
    w.as("a").join(w.as("b"),
        col("a.term") === col("b.term") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(sum(col("a.__w") * col("b.__w")).as("dot_q"))
      .join(norms.withColumnRenamed("id", "doc_a")
        .withColumnRenamed("__norm2", "__na"), Seq("doc_a"))
      .join(norms.withColumnRenamed("id", "doc_b")
        .withColumnRenamed("__norm2", "__nb"), Seq("doc_b"))
      .withColumn("cosine", col("dot_q").cast("double") /
        sqrt(col("__na").cast("double") * col("__nb").cast("double")))
      .where(col("cosine") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("dot_q"),
        round(col("cosine"), 4).as("cosine"))
  }

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

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR'09):
    * combine N independent per-query rankings — BM25, dense ANN,
    * recency, anything that emits (query, doc, rank) — into one list by
    * score(d) = Σ_systems 1/(k0 + rank_s(d)), k0 = 60 per the paper.
    * RRF is THE production hybrid-retrieval baseline (a RAG stack's
    * sparse+dense merge) precisely because it reads only RANKS: no
    * score normalization across incomparable scales, and a document
    * missing from a system's list simply contributes nothing.
    *
    * Determinism: each contribution quantizes to a 1e-9-grain long
    * (`round(1e9/(k0+rank))`) BEFORE the per-(query, doc) sum — the
    * [[bm25TopK]] discipline — so the fused order is decided on exact
    * integer sums, never a float summation order; ties break to the
    * lowest doc id. The shipped `rrf` double is one long/1e9 division.
    *
    * Scale shape: the inputs are top-k-per-query frames — RANKING
    * METADATA (k × queries rows each), not corpus data — so the whole
    * fusion is one union + one (query, doc)-keyed aggregate + one
    * per-query rank window over frames that are tiny by construction.
    * The corpus-scale work lives in the systems that PRODUCED the
    * rankings; fusion cost is independent of corpus size.
    *
    * @param rankings  per-system rankings, each carrying (qidCol,
    *                  idCol, rankCol); ranks are 1-based positions
    * @param k         fused results per query
    * @param k0        the RRF damping constant (60 in the paper: deep
    *                  ranks still vote, but top ranks dominate)
    * @return (qidCol, idCol, rrf_q, n_systems, fused_rank, rrf) —
    *         fused_rank 1..k by (rrf_q desc, idCol asc)
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, k0: Int = 60,
      qidCol: String = "query_id", idCol: String = "doc_id",
      rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 1, s"k must be >= 1, got $k")
    require(k0 >= 0, s"k0 must be >= 0, got $k0")
    val all = rankings
      .map(_.select(col(qidCol), col(idCol), col(rankCol)))
      .reduce(_.unionByName(_))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col("rrf_q").desc, col(idCol).asc)
    all
      .withColumn("__c",
        round(lit(1e9) / (lit(k0).cast("double") +
          col(rankCol).cast("double"))).cast("long"))
      .groupBy(col(qidCol), col(idCol))
      .agg(sum(col("__c")).as("rrf_q"), count(lit(1)).as("n_systems"))
      .withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= k)
      .withColumn("rrf", col("rrf_q").cast("double") / lit(1e9))
  }
}
