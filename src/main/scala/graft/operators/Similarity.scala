package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A built IVF index — the build-once half of the build/probe split
  * ([[Similarity.buildIvfIndex]] / [[Similarity.probeIvfQuantized]]).
  *
  *  - `centroids`: (cid, __cv) float coarse-quantizer centroids —
  *    metadata-sized (numCentroids rows), broadcast at probe time.
  *  - `lists`: (cid, neighbor_id, scale, codes, norm) int8 inverted
  *    lists; `norm` = sqrt(dot(codes, codes)) is precomputed at build
  *    time so the probe's per-candidate work is exactly one int-dot.
  *
  * Persist with [[Similarity.writeIvfIndex]] (lists hive-partitioned by
  * `cid`, so a probe's nprobe lists become partition PRUNING — zero I/O
  * for unprobed lists) and reopen with [[Similarity.readIvfIndex]]. At
  * 100 TB this split is the production shape: the index (Lloyd sweeps
  * included) is built ONCE per corpus version, and every query batch
  * pays only its probed lists.
  */
final case class IvfIndex(centroids: DataFrame, lists: DataFrame)

/** A built IVF×PQ index — IVFADC proper (Jégou, Douze, Schmid, TPAMI
  * 2011 §V): PQ codes stored INSIDE the IVF inverted lists, so a probe
  * runs asymmetric-distance computation only over its probed lists —
  * the production ANN shape that [[Similarity.pqAdcTopK]] (exhaustive
  * ADC) and [[Similarity.ivfTopKQuantized]] (pruned lists, int8 scalar
  * scoring) each supplied half of.
  *
  *  - `centroids`: (cid, __cv) float coarse-quantizer centroids —
  *    metadata-sized, broadcast at probe time.
  *  - `codebooks`: (m, cid, __cv) per-subspace PQ codebooks trained on
  *    RESIDUALS (vector − its coarse centroid) — M×K codewords,
  *    metadata-sized, broadcast at probe time.
  *  - `lists`: (cid, neighbor_id, codes) — M small ints per vector,
  *    the 32×-class compressed inverted-list entry. No floats, no
  *    norms: every scoring quantity reconstructs from the two
  *    metadata frames.
  *
  * Persist with [[Similarity.writeIvfPqIndex]] (lists hive-partitioned
  * by `cid` → probe-time partition pruning) and reopen with
  * [[Similarity.readIvfPqIndex]].
  */
final case class IvfPqIndex(centroids: DataFrame, codebooks: DataFrame,
  lists: DataFrame)

/** Similarity search over an embedding column (`array<float>`): exact
  * brute-force cosine top-k as the correctness baseline, and an
  * IVF-bucketed variant as the scale path.
  *
  * Scale design (100 TB):
  *  - cosine is a pure expression (`zip_with` + `aggregate` in double) —
  *    no UDF, no collect; the corpus never leaves the executors.
  *  - brute force broadcasts the (small) query set and streams the corpus
  *    once: O(|Q|·N) compute, one shuffle (the per-query top-k window).
  *    Right for |Q| in the hundreds; beyond that, or for corpus-scale
  *    all-pairs, use [[ivfTopK]]: assign vectors to inverted lists
  *    (nearest of C centroids), probe only `nprobe` lists per query —
  *    compute drops to ~O(|Q|·N·nprobe/C) at recall < 1.
  *  - pre-normalizing vectors once (norm carried alongside) would halve
  *    the flops for repeated querying; at one-shot query time it's a wash.
  */
object Similarity {

  /** Cosine similarity of two float-array columns, accumulated in double
    * (left-to-right, same order as the oracle's list_sum — engine-exact
    * up to final-ulp noise, which the 4-decimal rounding absorbs).
    */
  /** Dot product of two float-array columns in double precision, via the
    * custom codegen'd [[graft.functions.DotProductExpr]] (the equivalent
    * zip_with+aggregate formulation is interpreted — per-element lambda
    * dispatch and boxing — and was ~2.5× slower on the sf0.1 all-pairs
    * query; accumulation order and arithmetic are identical, so oracle
    * values are unchanged).
    */
  def dot(x: Column, y: Column): Column =
    graft.functions.VectorFunctions.dotProduct(x, y)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Shared top-k emission tail (ADVICE r13: previously duplicated
    * across the four top-k variants): per-query bounded-heap aggregate →
    * posexplode → (query_id, neighbor_id, rank, sim). Each map task
    * ships at most k candidates per query, so the shuffle is
    * k × partitions rows instead of all candidates (see
    * [[graft.functions.TopKAggregate]]). `scored` must carry
    * (query_id, neighbor_id, sim).
    */
  private def topKEmit(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopKAggregate
        .topKBy(col("neighbor_id"), col("sim"), k).as("__top"))
      .select(col("query_id"),
        posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("query_id"), col("__e.id").as("neighbor_id"),
        (col("__pos") + 1).as("rank"),
        round(col("__e.score"), 4).as("sim"))

  /** Coarse-quantizer centroid set shared by both IVF variants (ADVICE
    * r13: factored so a fix to one cannot silently miss the other).
    * Zero-norm vectors are excluded BEFORE the lowest-id init and from
    * the refinement corpus (ADVICE r13's latent bug: a zero vector among
    * the lowest ids became a centroid; its cosine to everything is NaN,
    * which sorts first under the desc ordering and wins every max_by
    * assignment — all inverted lists collapse into one and the "index"
    * silently degenerates to a brute-force scan).
    */
  private def centroidInit(emb: DataFrame, numCentroids: Int,
      kmeansIterations: Int, idCol: String, vecCol: String): DataFrame = {
    val nonZero = emb.filter(dot(col(vecCol), col(vecCol)) > 0)
    val init = nonZero.orderBy(col(idCol).asc).limit(numCentroids)
      .select(col(idCol).as("cid"), col(vecCol).as("__cv"))
    if (kmeansIterations > 0)
      kmeansCentroids(nonZero, init, kmeansIterations, idCol, vecCol)
    else init
  }

  /** Exact top-k neighbors for each query vector (brute force).
    *
    * @param emb       corpus: (idCol, vecCol)
    * @param queries   query set: (idCol, vecCol) — small; broadcast
    * @param k         neighbors per query
    * @return (query_id, neighbor_id, rank, sim) — rank 1..k by
    *         (sim desc, neighbor_id asc), self-matches excluded
    */
  def bruteForceTopK(
      emb: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"),
      sqrt(dot(col(vecCol), col(vecCol))).as("__qn")))
    val sims = emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("__v"),
        sqrt(dot(col(vecCol), col(vecCol))).as("__vn"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        dot(col("__qv"), col("__v")) / (col("__qn") * col("__vn")))
    topKEmit(sims, k)
  }

  /** Hard-negative mining for contrastive/embedding training — the
    * negatives that matter are the near-misses: for each anchor, the
    * top-k most cosine-similar corpus vectors carrying a DIFFERENT
    * label (the in-batch-plus-hard-negatives recipe of DPR, Karpukhin
    * 2020 §5.2, and the BM25/ANN-mined negatives of ANCE, Xiong 2020).
    * Output is [[bruteForceTopK]]'s exact schema — (query_id,
    * neighbor_id, rank, sim), rank 1..k by (sim desc, neighbor_id asc)
    * — restricted to label-mismatched candidates, so the frame drops
    * straight into a training-pair writer.
    *
    * Same scale shape as the parent: anchors broadcast, corpus streams
    * once, the label-mismatch predicate rides the broadcast join (the
    * corpus is filtered BEFORE the per-query bounded-heap aggregate, so
    * a same-label near-dup costs nothing), shuffle is k × partitions
    * rows per query. Rows with a NULL label on either side are excluded
    * by `=!=` semantics — an unlabeled vector can be neither anchor nor
    * negative. At corpus scale compose [[probeIvfQuantized]]'s candidate
    * lists with the same mismatch predicate instead of the brute scan.
    */
  def hardNegatives(
      emb: DataFrame,
      anchors: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val q = broadcast(anchors.select(col(idCol).as("query_id"),
      col(vecCol).as("__qv"), col(labelCol).as("__ql"),
      sqrt(dot(col(vecCol), col(vecCol))).as("__qn")))
    val sims = emb.select(col(idCol).as("neighbor_id"),
        col(labelCol).as("__nl"), col(vecCol).as("__v"),
        sqrt(dot(col(vecCol), col(vecCol))).as("__vn"))
      .join(q, col("neighbor_id") =!= col("query_id") &&
        col("__nl") =!= col("__ql"))
      .withColumn("sim",
        dot(col("__qv"), col("__v")) / (col("__qn") * col("__vn")))
    topKEmit(sims, k)
  }

  /** k-NN label agreement (neighborhood purity) — the mislabel /
    * boundary-noise signal for labeled embedding corpora (the kNN
    * heuristic behind confident-learning-style label cleaning, Northcutt
    * 2021 §1: a row whose neighborhood votes against its label is a
    * label-error candidate; purity ≈ 1 rows sit safely inside their
    * class). COMPOSITIONAL over any (query_id, neighbor_id, rank, sim)
    * neighbors frame — [[bruteForceTopK]] output for exact ground truth,
    * [[ivfTopK]]/[[probeIvfQuantized]] output for the corpus-scale
    * approximate path — so the purity arithmetic is written once and the
    * neighbor source stays the caller's recall/cost decision.
    *
    * Output: (idCol, labelCol, agree, k_used, purity) — one row per
    * query id present in `neighbors`; purity = agree / k_used, an exact
    * int/int division (engine-identical, no rounding bet). k_used counts
    * the neighbors actually present (a query with < k labeled neighbors
    * is scored over what exists, not padded). Neighbors without a label
    * row are dropped by the inner join — scored over labeled neighbors
    * only.
    *
    * Scale shape: two joins on id-projections only ((id, label) pairs —
    * vectors never move), then a map-side-combinable count/sum
    * aggregate over N·k rows keyed by query id.
    */
  def labelPurity(
      neighbors: DataFrame,
      labels: DataFrame,
      idCol: String = "vec_id",
      labelCol: String = "label"): DataFrame = {
    val ql = labels.select(col(idCol).as("query_id"),
      col(labelCol).as("__ql"))
    val nl = labels.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("__nl"))
    neighbors.join(ql, "query_id").join(nl, "neighbor_id")
      .groupBy(col("query_id"), col("__ql"))
      .agg(sum(when(col("__nl") === col("__ql"), 1).otherwise(0))
          .as("agree"),
        count(lit(1)).as("k_used"))
      .select(col("query_id").as(idCol), col("__ql").as(labelCol),
        col("agree"), col("k_used"),
        round(col("agree").cast("double") / col("k_used").cast("double"), 4)
          .as("purity"))
  }

  /** Embedding-cosine near-dup pairs: all (a < b) pairs with
    * cosine ≥ threshold. Exact — a blocked self-join, O(N²) compute with
    * N²/partitions parallelism. This is the correctness baseline / ground
    * truth; at corpus scale use [[hyperplaneNearDupPairs]], the bucketed
    * LSH path (gated against this operator's output in q60).
    */
  def cosineNearDupPairs(
      emb: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // Norms are computed once per vector, not once per pair: sqrt(dot(v,v))
    // here is bit-identical to computing it inline (same arithmetic), so
    // the oracle is unaffected while per-pair work drops to one dot.
    val normed = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(dot(col(vecCol), col(vecCol))).as("n"))
    val a = normed.select(col("id").as("vec_a"), col("v").as("__va"),
      col("n").as("__na"))
    val b = normed.select(col("id").as("vec_b"), col("v").as("__vb"),
      col("n").as("__nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("sim",
        dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 4).as("sim"))
  }

  /** Hyperplane-LSH (sign-random-projection) embedding near-dup pairs —
    * the bucketed scale path for [[cosineNearDupPairs]]. Same shape as
    * [[Dedup.minhashNearDupPairs]]: signature → banded bucket join →
    * distinct candidates → EXACT cosine verify ≥ `threshold`; only the
    * hash family differs (±1 hyperplane sign bits, cosine-sensitive,
    * instead of min-hashes, Jaccard-sensitive).
    *
    * Collision math (Charikar): a pair at cosine s agrees on one bit
    * with p = 1 − acos(s)/π, collides in an r-bit band with p^r, and is
    * missed entirely with (1 − p^r)^b. At the defaults (r=12, b=8) a
    * 0.997-similar pair is missed with p ≈ 2.5e-5 while a 0.3-similar
    * background pair becomes a candidate with p ≈ 1.7% — near-linear
    * bucket join, never all-pairs. Recall < 1 by construction at loose
    * thresholds: sign-LSH cannot separate 0.40 from 0.39 (the p-gap per
    * bit is ~1%), so size r·b for the similarity of the dups you hunt
    * (0.95+ for true near-dups), not the verify threshold. At 100 TB,
    * grow r with log N to bound bucket sizes and cap/salt hot buckets —
    * the same hardening as the MinHash path.
    */
  def hyperplaneNearDupPairs(
      emb: DataFrame,
      threshold: Double,
      bands: Int = 8,
      rowsPerBand: Int = 12,
      seed: Long = 42L,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    // Generator form, not posexplode(hyperplaneBands(...)): the inferred
    // size(e)>0 generate-filter would push the signature into the scan
    // and evaluate it twice per row (see VectorFunctions scaladoc).
    val bandRows = emb.select(col(idCol).as("id"),
      graft.functions.VectorFunctions.hyperplaneBandRows(
        col(vecCol), bands, rowsPerBand, seed).as(Seq("band", "key")))
    val a = bandRows.as("a"); val b = bandRows.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"))
      .distinct()
    val normed = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      sqrt(dot(col(vecCol), col(vecCol))).as("n"))
    val va = normed.select(col("id").as("vec_a"), col("v").as("__va"),
      col("n").as("__na"))
    val vb = normed.select(col("id").as("vec_b"), col("v").as("__vb"),
      col("n").as("__nb"))
    candidates.join(va, "vec_a").join(vb, "vec_b")
      .withColumn("sim",
        dot(col("__va"), col("__vb")) / (col("__na") * col("__nb")))
      .filter(col("sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 4).as("sim"))
  }

  /** Semantic dedup (the SemDeDup idea — Abbas et al. 2023 — with an
    * exact-verify LSH candidate stage instead of a k-means partition):
    * embedding-space near-duplicate GROUPS, one kept representative per
    * group. Composes [[hyperplaneNearDupPairs]] (banded SRP buckets →
    * exact cosine >= `threshold`) with [[Dedup.nearDupClusters]]
    * (connected components via label propagation), then keeps the
    * minimum id of each component as its canonical.
    *
    * Returns one row per input vector: (idCol, canonical, kept) —
    * `kept` = this vector is its group's representative; filtering on it
    * is the dedup action, keeping the full mapping is the lineage record.
    *
    * Scale notes inherit from the two parts: candidate generation is
    * bucket-join-bounded (never all-pairs) and clustering is one
    * shuffle per sweep with checkpointed lineage. Same recall contract
    * as [[hyperplaneNearDupPairs]]: size bands x rowsPerBand for the
    * similarity of the dups being hunted (0.95+), not the threshold.
    */
  def semanticDedup(
      emb: DataFrame,
      threshold: Double,
      bands: Int = 8,
      rowsPerBand: Int = 12,
      seed: Long = 42L,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val pairs = hyperplaneNearDupPairs(emb, threshold, bands, rowsPerBand,
        seed, idCol, vecCol)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val clusters = Dedup.nearDupClusters(pairs)
    emb.select(col(idCol))
      .join(clusters, col(idCol) === clusters("id"), "left")
      .select(col(idCol),
        coalesce(col("cluster"), col(idCol)).as("canonical"))
      .withColumn("kept", col(idCol) === col("canonical"))
  }

  /** Recall@k of an approximate top-k result against the exact one —
    * the tripwire for the approximate family: rows-only gates (q41)
    * verify shape, this verifies RETRIEVAL QUALITY, in-Spark, on the
    * same fixture (emitted as the q91 gate artifact and asserted
    * >= the contract floor in SimilaritySpec — a silent recall collapse
    * now fails a test instead of passing the rows-only check).
    *
    * Both inputs are (query_id, neighbor_id, ...) top-k frames
    * ([[bruteForceTopK]] / [[ivfTopK]] output shape). Per query:
    * `hits` = |approx ∩ exact|, `recall` = hits / |exact|. Ties at the
    * k-th similarity could make two correct engines disagree, but the
    * operators' deterministic (sim desc, id asc) ranking makes both
    * sides reproducible — the measurement is stable run to run.
    *
    * Scale shape: a left_semi join on (query_id, neighbor_id) + two
    * query-sized aggregates — both frames are |Q|·k rows, so this costs
    * nothing next to the searches it audits.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val hits = exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("k"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("k"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        round(coalesce(col("hits"), lit(0L)).cast("double") /
          col("k").cast("double"), 4).as("recall"))
  }

  /** Per-vector int8 quantization of an embedding column — the memory
    * path for similarity search at corpus scale: a 100 TB float
    * embedding store becomes ~25 TB of codes + one double per vector,
    * which is the difference between an index that fits executor memory
    * (broadcast, cached IVF cells) and one that doesn't. Adds
    * `scale` (max|v|/127) and `codes` (array<int>, values in [−127,127])
    * via the codegen'd [[graft.functions.VectorFunctions.int8Quantize]]
    * kernel; reconstruction vᵢ ≈ codesᵢ·scale with per-element error
    * ≤ scale/2. Per-row projection — no shuffle, scan speed.
    */
  def quantizeInt8(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    emb.withColumn("__q",
        graft.functions.VectorFunctions.int8Quantize(col(vecCol)))
      .select(col(idCol), col("__q.scale").as("scale"),
        col("__q.codes").as("codes"))

  /** Brute-force cosine top-k over QUANTIZED vectors: dot(a,b) ≈
    * scaleₐ·scale_b·dot(codesₐ, codes_b), norms likewise — the int-code
    * dot runs on the same codegen'd kernel (ints upcast to double,
    * exact: products ≤ 127² need 14 bits). Same bounded-heap top-k
    * shape as [[bruteForceTopK]]; SimilaritySpec gates recall vs the
    * exact float path ≥ 0.95 (the q91 pattern — a quantization-induced
    * ranking collapse is a test failure, not a silent quality drop).
    * Composes with [[ivfTopK]] at scale: cells quantized, residual
    * re-rank on floats for the final k only.
    *
    * Zero-norm vectors are EXCLUDED on both sides (ADVICE r8): a zero
    * vector has no cosine direction, its sim is 0/0 = NaN, and the
    * heap's NaN-first ordering would rank it above every real neighbor
    * — so a zero-norm corpus row is never a neighbor and a zero-norm
    * query returns no rows, rather than k garbage ones.
    */
  def quantizedTopK(
      emb: DataFrame,
      queries: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val qq = broadcast(quantizeInt8(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("scale").as("__qs"),
        col("codes").as("__qc"),
        sqrt(dot(col("codes"), col("codes"))).as("__qn"))
      .filter(col("__qn") > 0))
    val sims = quantizeInt8(emb, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col("scale").as("__vs"),
        col("codes").as("__vc"),
        sqrt(dot(col("codes"), col("codes"))).as("__vn"))
      .filter(col("__vn") > 0)
      .join(qq, col("neighbor_id") =!= col("query_id"))
      // scales cancel in cosine EXCEPT through the rounding of codes;
      // they are kept explicit so sim is the true reconstructed cosine
      .withColumn("sim",
        (col("__qs") * col("__vs") * dot(col("__qc"), col("__vc"))) /
          ((col("__qs") * col("__qn")) * (col("__vs") * col("__vn"))))
    topKEmit(sims, k)
  }

  // ------------------------------------------------------- product quant

  /** Subvector explosion shared by the PQ stages: (id, m, __v) with
    * `__v` = the m-th `subDim`-slice of the (double-cast) vector.
    * Fail-loud on a ragged vector column — a wrong-length vector would
    * otherwise silently encode against truncated slices.
    */
  private def subVectors(emb: DataFrame, idCol: String, vecCol: String,
      numSubspaces: Int, subDim: Int): DataFrame =
    emb.select(col(idCol).as("nid"),
        when(size(col(vecCol)) === numSubspaces * subDim,
          col(vecCol).cast("array<double>"))
          .otherwise(raise_error(concat(
            lit(s"pq: expected dim ${numSubspaces * subDim}, got "),
            size(col(vecCol)).cast("string")))).as("__w"))
      .select(col("nid"), posexplode(
        transform(sequence(lit(0), lit(numSubspaces - 1)),
          i => slice(col("__w"), i * subDim + 1, lit(subDim))))
        .as(Seq("m", "__v")))

  /** Squared Euclidean distance on the codegen'd dot kernel:
    * ‖a−b‖² = a·a − 2·a·b + b·b (the [[centroidOutliers]] expansion).
    */
  private def l2sq(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0) * dot(a, b) + dot(b, b)

  /** Product-quantization codebooks (Jégou, Douze, Schmid, TPAMI 2011
    * §II): the vector space splits into `numSubspaces` orthogonal
    * subspaces of dim/numSubspaces dims, each with its OWN
    * `codebookSize`-centroid k-means codebook — so a vector encodes to
    * `numSubspaces` small ints (64 float dims at M=8, K=16 → 8 codes:
    * 256 bytes → 8, 32×), while the effective codeword count is
    * K^M (16⁸ ≈ 4·10⁹ here) — the reason PQ beats one big codebook
    * ([[quantizeInt8]] is the 4× scalar rung below; this is the 32×+
    * rung the 100 TB vector store actually runs).
    *
    * Training is per-subspace Euclidean Lloyd, deterministic end to end
    * (the [[kmeansCentroids]] discipline, metric swapped to L2 —
    * subvectors are not unit-norm even when the parent vectors are):
    * init = the `codebookSize` lowest-id vectors' subvectors (cid =
    * 0..K−1 in id order), assignment ties break to the lowest cid, an
    * emptied cluster keeps its previous centroid, and every sweep
    * MATERIALIZES its codebooks (M × K × subDim doubles — metadata; the
    * collect-a-sketch move, without which sweep i re-runs all sweeps
    * < i). All M subspaces train in the SAME sweep over one exploded
    * scan — the per-iteration cost is one corpus pass regardless of M.
    *
    * Returns the LOCAL codebook frame (m, cid, __cv) — store it like
    * [[IvfIndex]] centroids; [[pqEncode]]/[[pqAdcTopK]] broadcast it.
    */
  def pqTrainCodebooks(
      emb: DataFrame,
      dim: Int,
      numSubspaces: Int = 8,
      codebookSize: Int = 16,
      iterations: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(numSubspaces >= 1 && dim % numSubspaces == 0,
      s"dim $dim must divide into numSubspaces $numSubspaces")
    require(codebookSize >= 2, s"codebookSize must be >= 2")
    val subDim = dim / numSubspaces
    val spark = emb.sparkSession
    def materialize(df: DataFrame): DataFrame = spark.createDataFrame(
      java.util.Arrays.asList(df.collect(): _*), df.schema)
    val subs = subVectors(emb, idCol, vecCol, numSubspaces, subDim)
    val wInit = Window.orderBy(col("nid").asc)
    val initIds = emb.select(col(idCol).as("nid"))
      .orderBy(col("nid").asc).limit(codebookSize)
      .withColumn("cid", row_number().over(wInit) - 1)
    var cents = materialize(subs.join(broadcast(initIds), Seq("nid"))
      .select(col("m"), col("cid"), col("__v").as("__cv")))
    for (_ <- 1 to iterations) {
      // per-row argmin through the codegen'd kernel against the
      // driver-local codebooks (round 21) — the K-way join explosion
      // and its (nid, m) assignment shuffle are gone; each sweep is
      // one exploded scan feeding the (m, cid, pos) mean aggregate
      // directly
      val cbArr = localCodebookArray(cents)
      val assigned = subs.select(col("m"),
        graft.functions.PqFunctions
          .pqNearestCode(col("__v"), col("m"), cbArr).as("cid"),
        col("__v"))
      val means = assigned
        .select(col("m"), col("cid"),
          posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy(col("m"), col("cid"), col("pos"))
        .agg(avg(col("x")).as("mu"))
        .groupBy(col("m"), col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mu")))),
          s => s.getField("mu")).as("__nv"))
      cents = materialize(cents.join(means, Seq("m", "cid"), "left")
        .select(col("m"), col("cid"),
          coalesce(col("__nv"), col("__cv")).as("__cv")))
    }
    cents
  }

  /** PQ-encode a corpus against trained codebooks: (id, codes) with
    * codes(m) = argmin-L2 codeword of subspace m (ties to the lowest
    * cid — deterministic re-encode). One exploded corpus scan + a
    * broadcast codebook join; codes are computed ONCE and stored — the
    * whole point is that queries then never touch the float vectors.
    *
    * Null semantics (ADVICE r21, documented contract): a NULL embedding
    * yields NULL codes (the kernel is null-intolerant), and downstream
    * ADC/top-k drops those rows — embeddings tables carry no null
    * vectors by construction. A RAGGED vector still fails loudly.
    */
  def pqEncode(
      emb: DataFrame,
      codebooks: DataFrame,
      dim: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val (numSubspaces, subDim) = pqShape(codebooks)
    require(numSubspaces * subDim == dim,
      s"codebooks are ${numSubspaces}×$subDim, vectors dim $dim")
    // one shuffle-free scan (round 21): the whole codes array is
    // assembled per row by the codegen'd [[graft.functions
    // .PqFunctions.pqCodes]] kernel — the explode → K-way join →
    // two-level groupBy re-assembly produced the same array with two
    // shuffles. The vector expression is evaluated exactly ONCE per
    // row (the CollapseProject hazard an expression-level argmin
    // tripped: an upstream OPQ rotation re-evaluated per lambda
    // reference). Same ragged-vector fail-loud, same distance
    // arithmetic and tie-break, so every code is unchanged.
    val cbArr = localCodebookArray(codebooks)
    emb.select(col(idCol),
      graft.functions.PqFunctions.pqCodes(col(vecCol), cbArr).as("codes"))
  }

  /** Asymmetric-distance (ADC) cosine top-k over PQ codes — [[ivfTopK]]'s
    * schema, [[quantizedTopK]]'s role at the 32× compression rung: the
    * query stays FLOAT, the corpus is codes-only, and similarity comes
    * from per-subspace lookup tables (Jégou §IV.A, inner-product form):
    *
    *   dot(q, x̂) = Σ_m  dot(q_m, codeword(m, codes_m))
    *   ‖x̂‖²      = Σ_m ‖codeword(m, codes_m)‖²   (subspaces orthogonal)
    *
    * so sim = reconstructed cosine, computed WITHOUT touching a float
    * corpus vector. The distance table (query × m × cid: partial dot +
    * codeword norm² — queries × M × K rows, metadata by the broadcast-
    * query contract) broadcasts onto one pass over the exploded codes;
    * per-query bounded-heap top-k as every sibling. Zero-norm guards on
    * both sides (ADVICE r8: NaN sorts first in the heap); zero-norm
    * RECONSTRUCTIONS are likewise excluded — a vector whose every
    * codeword is zero has no direction.
    *
    * At corpus scale this composes exactly like [[quantizedTopK]]: IVF
    * lists hold codes, the probe runs ADC inside probed lists only.
    */
  def pqAdcTopK(
      codes: DataFrame,
      queries: DataFrame,
      codebooks: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      codesCol: String = "codes"): DataFrame = {
    val (numSubspaces, subDim) = pqShape(codebooks)
    val qsubs = subVectors(
      queries.filter(dot(col(vecCol), col(vecCol)) > 0),
      idCol, vecCol, numSubspaces, subDim)
    val qnorms = queries.select(col(idCol).as("query_id"),
      sqrt(dot(col(vecCol), col(vecCol))).as("__qn"))
    val dt = qsubs.join(codebooks, Seq("m"))
      .select(col("nid").as("query_id"), col("m"),
        col("cid").as("code"),
        dot(col("__v"), col("__cv")).as("__pd"),
        dot(col("__cv"), col("__cv")).as("__cn"))
    val scored = codes
      .select(col(idCol).as("neighbor_id"),
        posexplode(col(codesCol)).as(Seq("m", "code")))
      .join(broadcast(dt), Seq("m", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy(col("neighbor_id"), col("query_id"))
      .agg(sum(col("__pd")).as("__num"), sum(col("__cn")).as("__n2"))
      .filter(col("__n2") > 0)
      .join(broadcast(qnorms), Seq("query_id"))
      .withColumn("sim", col("__num") / (col("__qn") * sqrt(col("__n2"))))
    topKEmit(scored, k)
  }

  /** ADC shortlist + exact float re-rank (Jégou §VII, the "IVFADC+R"
    * refinement — the shape every production PQ deployment runs): PQ
    * ranks are approximate in proportion to quantization error, so the
    * codes pick a `shortlist`-sized candidate set per query and the TRUE
    * cosine re-ranks only those. Recall is then bounded by "did the
    * shortlist contain the true top-k" — which grows with
    * shortlist/corpus — while the float vectors are touched for
    * shortlist × queries rows instead of the corpus (the broadcast
    * candidate set prunes the fetch join; at 100 TB the vectors come
    * from the store by id, never scanned for ranking).
    */
  def pqAdcRerankTopK(
      emb: DataFrame,
      codes: DataFrame,
      queries: DataFrame,
      codebooks: DataFrame,
      k: Int,
      shortlist: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      codesCol: String = "codes"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val cand = pqAdcTopK(codes, queries, codebooks, shortlist,
      idCol, vecCol, codesCol).select(col("query_id"), col("neighbor_id"))
    val q = broadcast(queries
      .filter(dot(col(vecCol), col(vecCol)) > 0)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val scored = emb
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__v"))
      .join(broadcast(cand), Seq("neighbor_id"))
      .join(q, Seq("query_id"))
      .withColumn("sim", cosine(col("__qv"), col("__v")))
    topKEmit(scored, k)
  }

  /** One-shot train→encode→ADC — the fixture-scale teaching path and
    * recall-gate target, mirroring [[ivfTopK]]'s role next to
    * [[buildIvfIndex]]: production stores the codebooks + codes and runs
    * [[pqAdcTopK]] alone (plus [[pqAdcRerankTopK]]'s float refinement
    * when recall targets demand it).
    */
  def pqTopK(
      emb: DataFrame,
      queries: DataFrame,
      k: Int,
      dim: Int,
      numSubspaces: Int = 8,
      codebookSize: Int = 16,
      iterations: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cb = pqTrainCodebooks(emb, dim, numSubspaces, codebookSize,
      iterations, idCol, vecCol)
    pqAdcTopK(pqEncode(emb, cb, dim, idCol, vecCol), queries, cb, k,
      idCol, vecCol)
  }

  /** (numSubspaces, subDim) off a codebook frame — both metadata-sized
    * aggregates on the already-local codebooks.
    */
  private def pqShape(codebooks: DataFrame): (Int, Int) = {
    val row = codebooks.agg(max(col("m")), max(size(col("__cv"))))
      .collect()(0)
    (row.getInt(0) + 1, row.getInt(1))
  }

  // ---------------------------------------------- local-literal argmin
  // (round 21): the PQ/kmeans assignment stages used to JOIN the corpus
  // against a broadcast codebook frame — a K-way row explosion
  // (N×M rows become N×M×K) followed by a (nid, m)-keyed shuffle whose
  // only job was to undo the explosion with min_by/max_by. The
  // codebooks are K×M-row DRIVER frames by construction (the documented
  // collect-a-sketch class — [[pqTrainCodebooks]] materializes every
  // sweep, [[IvfPqIndex.codebooks]] is metadata), so the argmin can run
  // PER ROW against a nested array literal instead: no explosion, no
  // assignment shuffle, one scan. The distance expression ([[l2sq]] on
  // the same dot kernel) and the (distance, cid) struct ordering are
  // byte-for-byte the ones min_by compared, so every assignment — and
  // therefore every code, reconstruction, and recall artifact — is
  // unchanged.

  /** Codebook frame (m, cid, __cv) → driver-side nested array with
    * cbs(m)(cid) = codeword (the [[graft.functions.PqFunctions]] kernel
    * metadata). Codeword values ride the exact float→double widening
    * the join path's `cast("array<double>")` performed.
    */
  private def localCodebookArray(codebooks: DataFrame)
      : Array[Array[Array[Double]]] = {
    val rows = codebooks.select(col("m").cast("int"), col("cid").cast("int"),
      col("__cv").cast("array<double>")).collect()
    require(rows.nonEmpty, "pq: empty codebook frame")
    val m = rows.map(_.getInt(0)).max + 1
    val k = rows.map(_.getInt(1)).max + 1
    val arr = Array.fill(m)(new Array[Array[Double]](k))
    rows.foreach(r => arr(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray)
    arr.foreach(_.foreach(v => require(v != null,
      "pq: codebook frame is missing (m, cid) entries")))
    arr
  }

  /** [[localCodebookArray]] as a nested literal column — for the
    * per-row codeword LOOKUP ([[pqReconstruct]]), where `element_at`
    * on a literal is O(1) and the codes input is a plain attribute.
    */
  private def codebookLit(codebooks: DataFrame): Column = {
    val nested: Seq[Seq[Seq[Double]]] =
      localCodebookArray(codebooks).toSeq.map(_.toSeq.map(_.toSeq))
    typedLit(nested)
  }

  /** argmax_cid cosine(v, centroid) with ties to the lowest cid over a
    * collected centroid frame (cid, __cv) — `max_by(cid,
    * struct(cosine, -cid))` as the codegen'd
    * [[graft.functions.NearestCentroidExpr]] kernel (round 22; ADVICE
    * r21: the prior per-centroid `struct(lit, typedLit)` literal array
    * bloated the plan toward the 64KB codegen method limit, and the
    * `transform` lambda re-evaluated a DERIVED vector input — e.g.
    * [[pqReconstruct]]'s output under [[kmeansCentroids]] — once per
    * centroid, the CollapseProject hazard). Centroids ride the exact
    * float→double widening the join path's `cast("array<double>")`
    * performed; cids are vector ids (not 0..K−1), integral by
    * construction, compared as longs for the tie-break and cast back to
    * the frame's cid type so downstream schemas are unchanged.
    */
  private def nearestCentroid(cents: DataFrame, v: Column): Column = {
    val fields = cents.schema.fieldNames
    require(fields.contains("cid") && fields.contains("__cv"),
      s"ivf: centroid frame must carry (cid, __cv), got ${fields.toSeq}")
    val cidType = cents.schema("cid").dataType
    val rows = cents.select(col("cid"), col("__cv").cast("array<double>"))
      .collect()
    require(rows.nonEmpty, "ivf: empty centroid frame")
    val cids = rows.map(r => r.get(0) match {
      case i: java.lang.Integer => i.longValue
      case l: java.lang.Long => l.longValue
      case s: java.lang.Short => s.longValue
      case o => throw new IllegalArgumentException(
        s"ivf: integral cid required, got ${Option(o).map(_.getClass)}")
    }).toSeq
    val cvs = rows.map(r => r.getSeq[Double](1)).toSeq
    graft.functions.PqFunctions.nearestCentroidId(v, cids, cvs)
      .cast(cidType)
  }

  /** Distance-to-centroid outlier scoring — the embedding-space health
    * check a curation pipeline runs before training (CLIP-filtering
    * shape: vectors far from the corpus center are mislabeled, noise, or
    * off-distribution; SemDeDup's complement — it removes the
    * too-similar, this flags the too-different).
    *
    * Per vector: Euclidean distance to the corpus mean vector, plus the
    * `is_outlier` flag at `threshold`. Exact and engine-mirrorable:
    *  - the centroid is a per-position mean via `posexplode` → grouped
    *    avg. Map-side partial aggregation reduces the shuffle to dim rows
    *    per task regardless of corpus size; the result is ONE dim-length
    *    row, broadcast to the distance pass. Each coordinate is rounded
    *    to 6 decimals so both engines' float-summation orders agree
    *    before any downstream arithmetic amplifies the ulp noise.
    *  - distance uses the expansion ‖v−c‖² = v·v − 2·v·c + c·c with all
    *    three dots on the codegen'd [[dot]] kernel (sequential
    *    index-order accumulation, the oracle's list_sum order);
    *    `greatest(·, 0)` guards the tiny negative residual the expansion
    *    can leave for vectors at the centroid.
    *
    * One corpus scan + one dim-sized aggregate — no self-join, no window;
    * at 100 TB this runs at scan speed after a metadata-sized broadcast.
    */
  def centroidOutliers(
      emb: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val cent = e.select(posexplode(col("__v")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(round(avg(col("x")), 6).as("c"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("__cent"))
      .withColumn("__cc", dot(col("__cent"), col("__cent")))
    e.crossJoin(broadcast(cent))
      .withColumn("dist", round(sqrt(greatest(
        dot(col("__v"), col("__v")) -
          lit(2.0) * dot(col("__v"), col("__cent")) + col("__cc"),
        lit(0.0))), 4))
      .select(col(idCol), col("dist"),
        (col("dist") >= threshold).as("is_outlier"))
  }

  /** Lloyd-iteration k-means refinement of a centroid set, cosine
    * metric, fully distributed: assign (broadcast centroids + `max_by`
    * argmax), then recompute means element-wise via `posexplode` →
    * grouped avg → array reassembly. Deterministic: ties in assignment
    * break to the lowest centroid id; empty clusters keep their previous
    * centroid (left join + coalesce).
    */
  def kmeansCentroids(
      emb: DataFrame,
      init: DataFrame,
      iterations: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    var cents = init.select(col("cid"), col("__cv"))
    // Each sweep MATERIALIZES its centroids (the collect-a-sketch move:
    // numCentroids × dim values — a few KB, the same size class as the
    // broadcast the assign step already ships). Without this, sweep i's
    // lazy plan re-executes all sweeps < i — every Lloyd iteration
    // re-scans `emb` once per PRIOR iteration, quadratic re-execution
    // that is invisible at 2 sweeps and ruinous at 20. Collecting to a
    // LocalRelation (rather than persist/unpersist juggling) keeps the
    // per-sweep plan at exactly one `emb` scan + one local build side,
    // independent of the iteration count.
    for (_ <- 1 to iterations) {
      // per-row argmax against the codegen'd centroid kernel (rounds
      // 21/22; see [[assignNearest]]) — the C-way join explosion and
      // the (nid)-keyed assignment shuffle are gone; each sweep is one
      // scan feeding the (cid, pos) mean aggregate directly, and the
      // kernel evaluates a derived vecCol (e.g. [[pqReconstruct]]'s
      // output) ONCE per row instead of once per centroid
      val assigned = emb.select(col(idCol).as("nid"), col(vecCol).as("__v"))
        .select(col("nid"), nearestCentroid(cents, col("__v")).as("cid"),
          col("__v"))
      val means = assigned
        .select(col("cid"), posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cid"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("__nv"))
      val next = cents.join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("__nv"), col("__cv")).as("__cv"))
      cents = emb.sparkSession.createDataFrame(
        java.util.Arrays.asList(next.collect(): _*), next.schema)
    }
    cents
  }

  /** IVF (inverted-file) approximate top-k — the FLOAT-list form.
    *
    * Coarse quantizer: the C lowest-id NON-zero-norm vectors act as
    * initial centroids (see [[centroidInit]]), optionally refined by
    * `kmeansIterations` Lloyd sweeps ([[kmeansCentroids]]) —
    * deterministic either way. Every corpus vector is assigned to its
    * nearest centroid (one broadcast join + `max_by` aggregation); each
    * query probes its `nprobe` nearest centroids and ranks only those
    * lists. Recall < 1 by construction — verified by rows/schema, not a
    * value oracle.
    *
    * Intent (round 15, closes the build/probe asymmetry note): this
    * one-shot float form is deliberately NOT split into build/probe
    * halves — it is the fixture-scale teaching path and the recall
    * REFERENCE the quantized gates measure against; the production
    * shape at 100 TB is [[buildIvfIndex]] → [[writeIvfIndex]] →
    * [[probeIvfQuantized]], whose int8 lists are the whole point of
    * storing an index (4× smaller hot set). A float index worth
    * persisting is a quantized index without the one step that pays
    * for persistence.
    */
  def ivfTopK(
      emb: DataFrame,
      queries: DataFrame,
      k: Int,
      numCentroids: Int = 16,
      nprobe: Int = 4,
      kmeansIterations: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents =
      centroidInit(emb, numCentroids, kmeansIterations, idCol, vecCol)
    val assigned = assignNearest(emb, cents, idCol, vecCol)

    // Each query probes its nprobe nearest lists.
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("__qs").desc, col("cid").asc)
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .filter(dot(col("__qv"), col("__qv")) > 0)
      .join(broadcast(cents))
      .withColumn("__qs", cosine(col("__qv"), col("__cv")))
      .withColumn("__pr", row_number().over(wq))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("__qv"), col("cid"))

    val scored = probes.join(assigned, "cid")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("__qv"), col("__v")))
    topKEmit(scored, k)
  }

  /** Quantized IVF approximate top-k — [[ivfTopK]] with the inverted
    * lists stored as int8 CODES instead of float vectors, probed by the
    * int-capable dot kernel: the production ANN memory shape (Jégou et
    * al.'s IVF + scalar quantization without the product-codebook step).
    * A float corpus that doesn't fit executor memory as cached lists
    * often does at 4 bytes → 1 byte + one double scale per vector —
    * at 100 TB that is the difference between probing cached lists and
    * re-reading parquet per query batch.
    *
    * Composition, stage by stage:
    *  - coarse quantizer: identical to [[ivfTopK]] (lowest-id init,
    *    optional Lloyd refinement, broadcast float centroids — the
    *    centroid table is metadata-sized, quantizing it saves nothing);
    *  - index build: one corpus pass assigns each vector to its nearest
    *    list on FLOAT cosine (build-time precision is free — it is the
    *    same scan that quantizes), then stores only
    *    (cid, id, scale, codes) — the int8 list entry;
    *  - probe: queries quantize once, rank their `nprobe` nearest
    *    centroids on float cosine, and score candidates with the
    *    int-code dot ([[quantizedTopK]]'s arithmetic: ints upcast to
    *    double, exact — products ≤ 127² need 14 bits), so the hot
    *    per-candidate loop never touches a float vector.
    *
    * Recall loses both the IVF probe miss AND the quantization ranking
    * noise — approximate by construction, so the driver gate is
    * rows-only (q136/q137); the ≥ 0.9 recall CONTRACT at the gate
    * parameters vs the exact float [[bruteForceTopK]] is asserted in
    * SimilaritySpec with a corrupted-result negative control (the q91
    * pattern). Zero-norm vectors are excluded on both sides, exactly as
    * in [[quantizedTopK]] (NaN would heap-rank first).
    *
    * This is the one-shot composition of [[buildIvfIndex]] +
    * [[probeIvfQuantized]] — correct at fixture scale, but it rebuilds
    * the index (Lloyd sweeps included) on every call; production at
    * 100 TB builds once via [[buildIvfIndex]]/[[writeIvfIndex]] and
    * probes the stored, cid-partitioned lists.
    */
  def ivfTopKQuantized(
      emb: DataFrame,
      queries: DataFrame,
      k: Int,
      numCentroids: Int = 16,
      nprobe: Int = 4,
      kmeansIterations: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    probeIvfQuantized(
      buildIvfIndex(emb, numCentroids, kmeansIterations, idCol, vecCol),
      queries, k, nprobe, idCol, vecCol)

  /** Build the quantized IVF index (the build-ONCE half): coarse
    * quantizer via [[centroidInit]] (lowest-id non-zero init, optional
    * Lloyd refinement), then one corpus pass that assigns each vector to
    * its nearest list on FLOAT cosine (build-time precision is free — it
    * is the same scan that quantizes) and stores only the int8 list
    * entry (cid, neighbor_id, scale, codes, norm). Zero-norm vectors
    * are dropped — they have no cosine direction and could never be a
    * neighbor ([[quantizedTopK]]'s contract).
    */
  def buildIvfIndex(
      emb: DataFrame,
      numCentroids: Int = 16,
      kmeansIterations: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): IvfIndex = {
    val cents =
      centroidInit(emb, numCentroids, kmeansIterations, idCol, vecCol)
    IvfIndex(cents, assignLists(emb, cents, idCol, vecCol))
  }

  /** Nearest-centroid assignment under a FIXED centroid set (argmax via
    * max_by — one pass, no window), shared by the float IVF
    * ([[ivfTopK]]) and the quantized build/append path. Zero-norm
    * vectors are excluded: they have no cosine direction, and under
    * ANSI SQL their 0/0 ranking is a DIVIDE_BY_ZERO error, not even a
    * quiet NaN.
    */
  private def assignNearest(emb: DataFrame, cents: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    // per-row cosine argmax via the codegen'd centroid kernel (rounds
    // 21/22): the unkeyed broadcast join exploded every vector C ways
    // and shuffled (neighbor_id)-keyed groups back together just to
    // undo it; same cosine arithmetic, same (sim, −cid) tie-break,
    // zero shuffles
    emb.select(col(idCol).as("neighbor_id"), col(vecCol).as("__v"))
      .filter(dot(col("__v"), col("__v")) > 0)
      .select(col("neighbor_id"),
        nearestCentroid(cents, col("__v")).as("cid"), col("__v"))
  }

  /** One corpus (or batch) pass turning vectors into int8 list entries
    * under a FIXED centroid set — the shared assignment stage of
    * [[buildIvfIndex]] and [[appendToIvfIndex]]: [[assignNearest]] +
    * quantization.
    */
  private def assignLists(emb: DataFrame, cents: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    assignNearest(emb, cents, idCol, vecCol)
      .withColumn("__q", graft.functions.VectorFunctions.int8Quantize(col("__v")))
      .select(col("cid"), col("neighbor_id"), col("__q.scale").as("scale"),
        col("__q.codes").as("codes"))
      .withColumn("norm", sqrt(dot(col("codes"), col("codes"))))
      .filter(col("norm") > 0)

  /** Incrementally extend a built index with a batch of newly arrived
    * vectors: the batch is assigned to the EXISTING centroids (one pass
    * over the batch only) and unioned onto the lists — the corpus-side
    * index is never rebuilt, re-scanned, or re-shuffled, the q74/q128
    * incremental-corpus discipline applied to ANN. At 100 TB this is
    * the difference between indexing a daily crawl delta at batch cost
    * and re-clustering the corpus nightly. This in-memory form only
    * unions the frames; for a [[writeIvfIndex]]-STORED index use
    * [[appendToStoredIvfIndex]], which writes ONLY the batch's list
    * entries as additional files under their cid partitions (hive
    * append — the stored corpus lists are never rewritten; ADVICE r14:
    * [[writeIvfIndex]] itself is mode=overwrite and must not be used to
    * persist an appended index).
    *
    * Centroids DRIFT as the corpus grows — the coarse quantizer stays
    * frozen here by design (assignment determinism + zero old-list
    * churn), so recall decays monotonically with appended volume (the
    * q140 artifact measures it). Recover with [[compactIvfIndex]] —
    * re-Lloyd from the stored lists, no corpus re-read — on a cadence
    * keyed to that artifact, or [[buildIvfIndex]] for a from-scratch
    * rebuild when the corpus itself is being re-scanned anyway.
    *
    * Batch ids must be NEW (ADVICE r15): neither append path checks the
    * existing lists (that check would cost a corpus-index scan per
    * batch), so re-appending a batch creates duplicate `neighbor_id`
    * entries — probes then return the duplicate as its own neighbor
    * twice, and [[compactIvfIndex]] fails loudly on it. Idempotent
    * ingest belongs upstream (dedup the batch ids before appending, the
    * q74 discipline).
    */
  def appendToIvfIndex(
      index: IvfIndex,
      newEmb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): IvfIndex =
    IvfIndex(index.centroids,
      index.lists.unionByName(
        assignLists(newEmb, index.centroids, idCol, vecCol)))

  /** [[appendToIvfIndex]] for a [[writeIvfIndex]]-stored index: assign
    * the batch against the STORED centroids and hive-append only the new
    * entries under their cid partitions — existing list files are
    * bit-untouched, probes see the batch on their next [[readIvfIndex]].
    * The batch-sized write is the entire cost; never re-persist an
    * appended in-memory index through [[writeIvfIndex]] (mode=overwrite
    * — it would rewrite the whole lists table).
    */
  def appendToStoredIvfIndex(
      spark: SparkSession,
      path: String,
      newEmb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val cents = spark.read.parquet(s"$path/centroids")
    assignLists(newEmb, cents, idCol, vecCol)
      .write.partitionBy("cid").mode("append").parquet(s"$path/lists")
  }

  /** One maintenance pass of [[maintainIvfIndex]]: what happened, and
    * the recall evidence it acted on.
    */
  final case class IvfMaintenanceReport(
      appended: Long, recallBefore: Double, compacted: Boolean,
      recallAfter: Double)

  /** Decay-triggered index maintenance (VERDICT r15 #7) — the cadence
    * recipe that finally CONNECTS the append path, the recall artifact,
    * and compaction: append a batch to the STORED index, measure the
    * q140-style recall artifact against a held-out probe set, and
    * compact (re-Lloyd + rewrite) only when recall has decayed below
    * `recallFloor`. This is what a real ANN service runs nightly; the
    * three pieces existed since r14/r15 but nothing invoked compaction
    * from evidence.
    *
    * No admission gate here, deliberately (contrast
    * [[maintainIvfPqIndex]]'s [[pqBatchError]] refusal): int8 scalar
    * quantization is PER-VECTOR (scale = max|v|/127 of that vector) —
    * nothing about it is trained on the old corpus's distribution, so
    * a shifted batch quantizes exactly as faithfully as the build
    * corpus did and the only decay mode is the coarse probe miss this
    * loop already measures. PQ decays doubly because its codebooks ARE
    * corpus-trained; that is the asymmetry, not an omission.
    *
    * Ground truth is the brute-force top-k over the index's OWN
    * dequantized lists — the corpus projection the index already stores
    * — so maintenance never re-reads or re-embeds the corpus
    * ([[compactIvfIndex]]'s discipline); the measured recall is "of
    * what the index could possibly return", which is exactly the
    * quantity the frozen-centroid decay erodes. Cost per pass: the
    * batch-sized append write + one |probes| × |lists| dot-product scan
    * (the q91 artifact's cost — probes are held-out and metadata-sized
    * by contract) and, when triggered, the compaction sweeps plus one
    * full lists rewrite ([[writeIvfIndex]] overwrite — relabeled
    * entries move between cid partitions, so a rewrite is the operation,
    * not an implementation shortcut). The relabeled lists are staged
    * eagerly (localCheckpoint) before that overwrite — the compacted
    * plan reads the very files the write replaces; at a scale where
    * staging the lists in cluster storage hurts, write to a versioned
    * sibling directory and flip a pointer instead.
    *
    * The recall scalar is the only thing collected (one averaged row).
    */
  def maintainIvfIndex(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      probes: DataFrame,
      recallFloor: Double,
      k: Int = 5,
      nprobe: Int = 1,
      iterations: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): IvfMaintenanceReport = {
    require(recallFloor > 0.0 && recallFloor <= 1.0,
      s"recallFloor must be in (0, 1], got $recallFloor")
    val appended = batch.count()
    if (appended > 0L) {
      appendToStoredIvfIndex(spark, path, batch, idCol, vecCol)
    }
    def meanRecall(index: IvfIndex): Double = {
      val recon = index.lists.select(col("neighbor_id").as(idCol),
        transform(col("codes"), c => c.cast("double") * col("scale"))
          .as(vecCol))
      val exact = bruteForceTopK(recon, probes, k, idCol, vecCol)
      val approx = probeIvfQuantized(index, probes, k, nprobe, idCol, vecCol)
      recallAtK(approx, exact).agg(avg(col("recall")))
        .collect()(0).getDouble(0)
    }
    val grown = readIvfIndex(spark, path)
    val before = meanRecall(grown)
    if (before >= recallFloor) {
      IvfMaintenanceReport(appended, before, compacted = false, before)
    } else {
      val compacted = compactIvfIndex(grown, iterations)
      // stage before overwrite: the relabeled plan reads the files the
      // write replaces (see scaladoc)
      val staged = IvfIndex(compacted.centroids,
        compacted.lists.transform(Persist.round))
      writeIvfIndex(staged, path)
      val after = meanRecall(readIvfIndex(spark, path))
      IvfMaintenanceReport(appended, before, compacted = true, after)
    }
  }

  /** Compact a drifted index: re-run Lloyd sweeps with the CURRENT
    * centroids as the warm start, over the corpus AS THE LISTS STORE IT
    * (each entry dequantized to scale·codes — the lists are the corpus
    * projection, so compaction never re-reads or re-embeds the corpus),
    * then re-assign every entry to its nearest new centroid. The entry
    * payload (id, scale, codes, norm) is centroid-INDEPENDENT and rides
    * through the argmax bit-untouched — compaction moves entries between
    * lists, it never re-quantizes them.
    *
    * Why: [[appendToIvfIndex]] freezes the coarse quantizer, so recall
    * decays monotonically as appended mass pulls the true cluster
    * structure away from the frozen centroids (q140's artifact: 0.8 min
    * recall after one 20% append). Compacting re-centers the quantizer
    * on the grown corpus — the spec gates that build → append×3 →
    * compact recovers at least the fresh-build recall on the gate
    * fixture, with a skip-compact negative control strictly below.
    *
    * Scale shape: `iterations` Lloyd sweeps over the dequantized lists
    * (each one scan + a metadata collect, [[kmeansCentroids]]'s
    * discipline) + one assignment pass whose `max_by` carries the entry
    * struct — no self-join, no corpus shuffle beyond the per-entry
    * argmax aggregation. Quantization noise makes dequantized
    * assignments differ from build-time float assignments by at most
    * the code rounding (~0.4% of a coordinate) — inside the noise the
    * recall contract already absorbs.
    *
    * Gated in the spec, deliberately NOT as a bench artifact: on the
    * natural embeddings fixture frozen-centroid drift is negligible
    * (q140 holds 0.94 recall even frozen) and the int8 ranking noise
    * floor buries the probe-miss component a compaction recovers
    * (measured while building the gate: a planted new mode consolidates
    * perfectly — one centroid captures all of it — yet recall moves
    * inside the noise), so the contract is asserted where it is crisp:
    * the spec's boundary-blob fixture with strict inequalities.
    *
    * List-id uniqueness contract (ADVICE r15): `neighbor_id` must be
    * unique across the lists — the append paths ([[appendToIvfIndex]],
    * [[appendToStoredIvfIndex]]) do not guard against re-appending a
    * batch, and the per-id `groupBy` here would silently collapse any
    * duplicate entries to one, making compaction NOT the pure relabel
    * the contract promises (invisibly to the payload set-equality
    * spec). The guard is in-plan: a duplicate id fails the job loudly,
    * naming the id, instead of quietly "fixing" a double-append.
    */
  def compactIvfIndex(index: IvfIndex, iterations: Int = 2): IvfIndex = {
    require(iterations >= 1,
      s"compaction without Lloyd sweeps is a no-op relabel, got $iterations")
    val recon = index.lists.select(col("neighbor_id").as("vec_id"),
      transform(col("codes"), c => c.cast("double") * col("scale"))
        .as("embedding"))
    val cents = kmeansCentroids(recon, index.centroids, iterations)
    // metadata-bounded eager count (numCentroids rows) — feeds the
    // duplicate-id guard below; kmeansCentroids already ran eager sweeps
    val nCents = cents.count()
    val relabeled = index.lists
      .withColumn("__v",
        transform(col("codes"), c => c.cast("double") * col("scale")))
      .drop("cid")
      .join(broadcast(cents))
      .withColumn("__cs", cosine(col("__v"), col("__cv")))
      .groupBy(col("neighbor_id"))
      .agg(max_by(struct(col("cid"), col("scale"), col("codes"), col("norm")),
        struct(col("__cs"), -col("cid"))).as("__e"),
        // one row per (entry, centroid) reaches this agg, so a unique id
        // contributes exactly |centroids| rows — more means duplicate
        // list entries (double-append); the check piggybacks on the agg,
        // no extra pass (ADVICE r15)
        count(lit(1)).as("__n"))
      .select(
        when(col("__n") > nCents,
          raise_error(concat(lit("compactIvfIndex: duplicate neighbor_id "),
            col("neighbor_id").cast("string"),
            lit(" in lists — was a batch appended twice?"))))
          .otherwise(col("__e.cid")).as("cid"),
        col("neighbor_id"),
        col("__e.scale").as("scale"), col("__e.codes").as("codes"),
        col("__e.norm").as("norm"))
    IvfIndex(cents, relabeled)
  }

  /** Probe-MANY half: rank each query's `nprobe` nearest centroids on
    * float cosine (the centroid table is metadata-sized), then score
    * only those lists with the int-code dot ([[quantizedTopK]]'s
    * arithmetic — scales cancel in the cosine, the candidate score is
    * the int-dot over code norms).
    *
    * The probed-cid set (≤ numCentroids values — metadata-sized, the
    * same class as the centroid broadcast) is collected once and pushed
    * as an `isin` filter in the LISTS' cid type, so a
    * [[writeIvfIndex]]-stored lists table prunes to exactly the probed
    * hive partitions (`PartitionFilters` in the scan — asserted by
    * SimilaritySpec's plan test; unprobed lists cost zero I/O). An
    * in-memory lists frame just gains a cheap filter.
    *
    * NOTE — this method runs an EAGER Spark job at call time (ADVICE
    * r14): the static cid pruning above requires the probed-cid set
    * before the returned plan can be built, so the probe subtree
    * (queries × centroids ranking) executes here, not at the caller's
    * first action. The probe frame is localCheckpointed by that same
    * job — nprobe rows per query, batch-sized — so the returned plan
    * REUSES it rather than recomputing the ranking window a second
    * time; a DataFrame-returning builder pays the probe pass exactly
    * once either way.
    *
    * Per-call retention (ADVICE r15): the checkpointed probe frame's
    * storage blocks live until the SparkSession ends — they cannot be
    * unpersisted here because the RETURNED plan references them, and a
    * DataFrame gives no completion hook. Each is batch-sized (nprobe
    * rows per query), so a long-running probe service calling this in a
    * loop accumulates ~|batch| rows of block storage per call; such a
    * service should periodically recycle its session, or call
    * `spark.sharedState.cacheManager`-level cleanup between batches,
    * the same lifecycle discipline as any checkpoint-per-request
    * server.
    */
  def probeIvfQuantized(
      index: IvfIndex,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = broadcast(index.centroids)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("__qs").desc, col("cid").asc)
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qq", graft.functions.VectorFunctions.int8Quantize(col("__qv")))
      .withColumn("__qc", col("__qq.codes"))
      .withColumn("__qn", sqrt(dot(col("__qc"), col("__qc"))))
      .filter(col("__qn") > 0)
      .join(cents)
      .withColumn("__qs", cosine(col("__qv"), col("__cv")))
      .withColumn("__pr", row_number().over(wq))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("__qc"), col("__qn"), col("cid"))
      // eager: the cid collect below needs this subtree NOW; checkpointing
      // it in the same job lets the returned plan reuse it (see scaladoc)
      .transform(Persist.round)
    // Static partition pruning: collect the probed cids (bounded by
    // numCentroids — metadata, not data) in the lists' own cid type (a
    // hive-partitioned read may have narrowed long cids to int; a cast
    // on the ATTRIBUTE side would block pruning, so the literals are
    // cast instead).
    val cidType = index.lists.schema("cid").dataType
    val probedCids = probes.select(col("cid").cast(cidType)).distinct()
      .collect().map(_.get(0)).toSeq
    val lists = index.lists.filter(col("cid").isin(probedCids: _*))
    val scored = probes.join(lists, "cid")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        dot(col("__qc"), col("codes")) / (col("__qn") * col("norm")))
    topKEmit(scored, k)
  }

  /** Persist an [[IvfIndex]]: lists hive-partitioned by `cid` (so
    * [[probeIvfQuantized]]'s isin filter becomes partition pruning —
    * whole unprobed-list directories skipped), centroids as one small
    * parquet. At 100 TB, numCentroids should be sized in the thousands
    * so each list directory holds ~GB-class files.
    */
  def writeIvfIndex(index: IvfIndex, path: String): Unit = {
    graft.sources.Layout.writePartitioned(index.lists, s"$path/lists",
      Seq("cid"))
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Reopen a stored [[IvfIndex]] for [[probeIvfQuantized]]. */
  def readIvfIndex(spark: SparkSession, path: String): IvfIndex =
    IvfIndex(spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/lists"))

  /** Build the IVFADC index (Jégou TPAMI 2011 §V — VERDICT r17 gap #1):
    * coarse quantizer via [[centroidInit]], one corpus pass assigning
    * each vector to its nearest list on float cosine, then PQ codebooks
    * trained ON THE RESIDUALS (vector − its coarse centroid — residuals
    * have far less energy than raw vectors, so the same M×K codebook
    * budget quantizes them much more precisely; this is why IVFADC
    * beats IVF+rawPQ at equal bits) and each residual encoded to M
    * small ints. Stored per vector: ONE list id + M codes — at M=16,
    * K=32 that is 64 float dims → 16 codes, with probes touching only
    * probed lists.
    *
    * Deterministic end to end: lowest-id inits, lowest-cid tie-breaks,
    * every Lloyd sweep materializes metadata-sized codebooks (the
    * [[pqTrainCodebooks]] discipline). The residual frame feeds the
    * codebook sweeps AND the encode pass, so it checkpoints once.
    */
  def buildIvfPqIndex(
      emb: DataFrame,
      dim: Int,
      numCentroids: Int = 16,
      numSubspaces: Int = 8,
      codebookSize: Int = 16,
      iterations: Int = 2,
      kmeansIterations: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): IvfPqIndex = {
    require(numSubspaces >= 1 && dim % numSubspaces == 0,
      s"dim $dim must divide into numSubspaces $numSubspaces")
    val cents =
      centroidInit(emb, numCentroids, kmeansIterations, idCol, vecCol)
    val resid = pqResiduals(emb, cents, idCol, vecCol)
    val cb = pqTrainCodebooks(resid, dim, numSubspaces, codebookSize,
      iterations, idCol = "neighbor_id", vecCol = "__r")
    IvfPqIndex(cents, cb, encodePqLists(resid, cb))
  }

  /** Residual frame (neighbor_id, cid, __r) under a FIXED coarse
    * quantizer — the shared assignment stage of [[buildIvfPqIndex]],
    * both PQ append paths, and [[compactIvfPqIndex]]'s re-encode.
    * Checkpointed once: every caller reads it at least twice (codebook
    * sweeps/encode, or encode/cid join-back). Zero-norm vectors are
    * excluded by [[assignNearest]]'s contract (no cosine direction;
    * ANSI 0/0 is an error, not a NaN).
    */
  private def pqResiduals(emb: DataFrame, cents: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    assignNearest(emb, cents, idCol, vecCol)
      .join(broadcast(cents), Seq("cid"))
      .select(col("neighbor_id"), col("cid"),
        zip_with(col("__v").cast("array<double>"),
          col("__cv").cast("array<double>"),
          (a, b) => a - b).as("__r"))
      .transform(Persist.round)

  /** Encode a [[pqResiduals]] frame into inverted-list entries
    * (cid, neighbor_id, codes) under FIXED codebooks — the list-build
    * tail shared by [[buildIvfPqIndex]] and the append paths.
    */
  private def encodePqLists(resid: DataFrame,
      codebooks: DataFrame): DataFrame = {
    val (numSubspaces, subDim) = pqShape(codebooks)
    pqEncode(resid, codebooks, numSubspaces * subDim,
        idCol = "neighbor_id", vecCol = "__r")
      .join(resid.select(col("neighbor_id"), col("cid")),
        Seq("neighbor_id"))
      .select(col("cid"), col("neighbor_id"), col("codes"))
  }

  /** Probe an [[IvfPqIndex]] — ADC over probed lists ONLY (the §V
    * composition [[pqAdcTopK]]'s scaladoc promised): each query ranks
    * its `nprobe` nearest coarse centroids on float cosine, the probed
    * cids become a static isin filter (partition PRUNING on a stored
    * index — unprobed list directories are zero I/O), and candidates
    * score by reconstructed cosine without touching a float corpus
    * vector:
    *
    *   x̂ = c + Σ_m cw(m, codes_m)        (centroid + residual codewords)
    *   dot(q, x̂) = dot(q, c) + Σ_m dot(q_m, cw_m)
    *   ‖x̂‖²      = ‖c‖² + 2·Σ_m dot(c_m, cw_m) + Σ_m ‖cw_m‖²
    *
    * — the cosine/inner-product form needs NO query-residual tables:
    * dot(q, c) rides on the probe ranking pass, the per-(query, m,
    * code) and per-(cid, m, code) lookup tables are Q×M×K and C×M×K
    * rows (metadata by the broadcast-query contract), and the hot loop
    * is one pass over the probed lists' exploded codes joined against
    * broadcasts. Zero-norm queries and zero-norm reconstructions are
    * excluded ([[pqAdcTopK]]'s contract — NaN would heap-rank first).
    *
    * Recall loses the IVF probe miss AND the PQ ranking noise —
    * approximate by construction, rows-only at the driver gate; the
    * recall contract (vs [[bruteForceTopK]], with a corrupted-result
    * control) is asserted in PqSpec, and [[ivfPqRerankTopK]] is the
    * float-re-rank rung above it.
    */
  def probeIvfPq(
      index: IvfPqIndex,
      queries: DataFrame,
      k: Int,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val (numSubspaces, subDim) = pqShape(index.codebooks)
    val cb = broadcast(index.codebooks)
    val cents = broadcast(index.centroids)
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("__qs").desc, col("cid").asc)
    val probes = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .filter(dot(col("__qv"), col("__qv")) > 0)
      .join(cents)
      .withColumn("__qs", cosine(col("__qv"), col("__cv")))
      .withColumn("__pr", row_number().over(wq))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("__qv"), col("cid"),
        dot(col("__qv"), col("__cv")).as("__qc0"),
        sqrt(dot(col("__qv"), col("__qv"))).as("__qn"))
      .transform(Persist.round)
    // static partition pruning, in the lists' own cid type (the
    // probeIvfQuantized discipline: casting the literal side keeps a
    // hive-narrowed cid column prunable)
    val cidType = index.lists.schema("cid").dataType
    val probedCids = probes.select(col("cid").cast(cidType)).distinct()
      .collect().map(_.get(0)).toSeq
    val lists = index.lists.filter(col("cid").isin(probedCids: _*))
    // per-(query, m, code) partial dots — Q×M×K rows, broadcast
    val qd = subVectors(
        probes.select(col("query_id"), col("__qv")).distinct(),
        "query_id", "__qv", numSubspaces, subDim)
      .join(cb, Seq("m"))
      .select(col("nid").as("query_id"), col("m"),
        col("cid").as("code"), dot(col("__v"), col("__cv")).as("__qd"))
    // per-(cid, m, code) centroid×codeword terms — C×M×K rows, broadcast
    val ct = subVectors(
        index.centroids.select(col("cid").as("__pc"), col("__cv")),
        "__pc", "__cv", numSubspaces, subDim)
      .join(cb, Seq("m"))
      .select(col("nid").as("cid"), col("m"), col("cid").as("code"),
        dot(col("__v"), col("__cv")).as("__cc"),
        dot(col("__cv"), col("__cv")).as("__cwn"))
    val cn0 = index.centroids
      .select(col("cid"), dot(col("__cv"), col("__cv")).as("__cn0"))
    val scored = lists
      .select(col("cid"), col("neighbor_id"),
        posexplode(col("codes")).as(Seq("m", "code")))
      .join(broadcast(probes.select(col("query_id"), col("cid"))),
        Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .join(broadcast(qd), Seq("query_id", "m", "code"))
      .join(broadcast(ct), Seq("cid", "m", "code"))
      .groupBy(col("query_id"), col("neighbor_id"), col("cid"))
      .agg(sum(col("__qd")).as("__num_r"), sum(col("__cc")).as("__cross"),
        sum(col("__cwn")).as("__rn"))
      .join(broadcast(probes.select(col("query_id"), col("cid"),
        col("__qc0"), col("__qn"))), Seq("query_id", "cid"))
      .join(broadcast(cn0), Seq("cid"))
      .withColumn("__n2",
        col("__cn0") + lit(2.0) * col("__cross") + col("__rn"))
      .filter(col("__n2") > 0)
      .withColumn("sim",
        (col("__qc0") + col("__num_r")) / (col("__qn") * sqrt(col("__n2"))))
    topKEmit(scored, k)
  }

  /** One-shot build→probe IVFADC — the fixture-scale teaching path and
    * recall-gate target ([[ivfTopKQuantized]]'s role at the PQ rung);
    * production builds once ([[buildIvfPqIndex]] → [[writeIvfPqIndex]])
    * and probes the stored, cid-partitioned lists.
    */
  def ivfPqTopK(
      emb: DataFrame,
      queries: DataFrame,
      k: Int,
      dim: Int,
      numCentroids: Int = 16,
      nprobe: Int = 4,
      numSubspaces: Int = 8,
      codebookSize: Int = 16,
      iterations: Int = 2,
      kmeansIterations: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    probeIvfPq(
      buildIvfPqIndex(emb, dim, numCentroids, numSubspaces, codebookSize,
        iterations, kmeansIterations, idCol, vecCol),
      queries, k, nprobe, idCol, vecCol)

  /** IVFADC+R (Jégou §VII at the full composition): the probed-list ADC
    * shortlist picks `shortlist` candidates per query, the TRUE float
    * cosine re-ranks only those — float vectors are fetched for
    * shortlist × queries rows by id (broadcast candidate semi-join),
    * never scanned for ranking. Recall is bounded by "did the probed
    * lists contain the true top-k" — the IVF miss survives re-ranking
    * (PqSpec measures both stages).
    */
  def ivfPqRerankTopK(
      emb: DataFrame,
      index: IvfPqIndex,
      queries: DataFrame,
      k: Int,
      shortlist: Int,
      nprobe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val cand = probeIvfPq(index, queries, shortlist, nprobe, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    val q = broadcast(queries
      .filter(dot(col(vecCol), col(vecCol)) > 0)
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv")))
    val scored = emb
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__v"))
      .join(broadcast(cand), Seq("neighbor_id"))
      .join(q, Seq("query_id"))
      .withColumn("sim", cosine(col("__qv"), col("__v")))
    topKEmit(scored, k)
  }

  /** Persist an [[IvfPqIndex]]: lists hive-partitioned by `cid` (probe
    * isin → partition pruning), centroids + codebooks as small parquet.
    */
  def writeIvfPqIndex(index: IvfPqIndex, path: String): Unit = {
    graft.sources.Layout.writePartitioned(index.lists, s"$path/lists",
      Seq("cid"))
    index.centroids.write.mode("overwrite").parquet(s"$path/centroids")
    index.codebooks.write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Reopen a stored [[IvfPqIndex]] for [[probeIvfPq]]. */
  def readIvfPqIndex(spark: SparkSession, path: String): IvfPqIndex =
    IvfPqIndex(spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/codebooks"),
      spark.read.parquet(s"$path/lists"))

  /** Incrementally extend a built IVFADC index with a batch of newly
    * arrived vectors — [[appendToIvfIndex]]'s discipline at the PQ
    * rung (VERDICT r18 gap #2): the batch is assigned to the EXISTING
    * coarse centroids and residual-encoded against the EXISTING
    * codebooks (one pass over the batch only), then unioned onto the
    * lists. Both quantizers stay frozen by design (assignment + code
    * determinism, zero old-list churn), so batch entries are
    * bit-identical to what a build-time encode of the same vectors
    * under the same quantizers would store.
    *
    * Decay is DOUBLE here ([[compactIvfPqIndex]]'s reason to exist):
    * the frozen coarse centroids cost probe recall exactly like the
    * int8 index, AND the frozen residual codebooks quantize appended
    * residuals with codewords trained on the old corpus's residual
    * distribution — ADC ranking noise grows with appended volume on
    * top of the probe miss. The q231 artifact measures the composite;
    * recover on recall evidence with [[maintainIvfPqIndex]].
    *
    * Batch ids must be NEW (the [[appendToIvfIndex]] ADVICE r15
    * contract, same reasoning): no existing-list membership check —
    * that would cost a corpus-index scan per batch — so a re-appended
    * batch creates duplicate `neighbor_id` entries, which probes
    * return twice and [[compactIvfPqIndex]] fails loudly on.
    */
  def appendToIvfPqIndex(
      index: IvfPqIndex,
      newEmb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): IvfPqIndex =
    IvfPqIndex(index.centroids, index.codebooks,
      index.lists.unionByName(
        encodePqLists(pqResiduals(newEmb, index.centroids, idCol, vecCol),
          index.codebooks)))

  /** [[appendToIvfPqIndex]] for a [[writeIvfPqIndex]]-stored index:
    * encode the batch against the STORED quantizers and hive-append
    * only the new entries under their cid partitions — existing list
    * files are bit-untouched, probes see the batch on their next
    * [[readIvfPqIndex]]. The batch-sized encode + write is the entire
    * cost; never re-persist an appended in-memory index through
    * [[writeIvfPqIndex]] (mode=overwrite — it would rewrite the whole
    * lists table).
    */
  def appendToStoredIvfPqIndex(
      spark: SparkSession,
      path: String,
      newEmb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val cents = spark.read.parquet(s"$path/centroids")
    val cb = spark.read.parquet(s"$path/codebooks")
    encodePqLists(pqResiduals(newEmb, cents, idCol, vecCol), cb)
      .write.partitionBy("cid").mode("append").parquet(s"$path/lists")
  }

  /** The corpus AS THE INDEX STORES IT — every entry reconstructed to
    * x̂ = c + Σ_m codeword(m, codes_m), the [[compactIvfIndex]]
    * dequantize move at the PQ rung. One exploded pass over the lists
    * against the broadcast codebooks; reassembly is deterministic
    * (subspaces sort by m). Feeds [[compactIvfPqIndex]]'s re-cluster
    * and [[maintainIvfPqIndex]]'s ground truth, so maintenance never
    * re-reads or re-embeds the float corpus.
    *
    * Duplicate-id guard (the [[compactIvfIndex]] ADVICE r15 contract):
    * a unique entry contributes exactly `numSubspaces` exploded rows,
    * so a double-appended id shows 2M rows in its group — the per-id
    * reassembly would silently interleave two entries' codewords into
    * one garbage vector; instead the count piggybacks on the agg and
    * fails the job naming the id.
    */
  def reconstructPq(index: IvfPqIndex): DataFrame = {
    val (numSubspaces, _) = pqShape(index.codebooks)
    val cb = broadcast(index.codebooks
      .select(col("m"), col("cid").as("code"),
        col("__cv").cast("array<double>").as("__cw")))
    index.lists
      .select(col("cid"), col("neighbor_id"),
        posexplode(col("codes")).as(Seq("m", "code")))
      .join(cb, Seq("m", "code"))
      .groupBy(col("neighbor_id"))
      .agg(min(col("cid")).as("cid"), count(lit(1)).as("__n"),
        transform(array_sort(collect_list(struct(col("m"), col("__cw")))),
          s => s.getField("__cw")).as("__parts"))
      .select(col("neighbor_id"),
        when(col("__n") =!= numSubspaces,
          raise_error(concat(
            lit("reconstructPq: duplicate neighbor_id "),
            col("neighbor_id").cast("string"),
            lit(" in lists — was a batch appended twice?"))))
          .otherwise(col("cid")).as("cid"),
        flatten(col("__parts")).as("__r"))
      .join(broadcast(index.centroids), Seq("cid"))
      .select(col("neighbor_id").as("vec_id"),
        zip_with(col("__r"), col("__cv").cast("array<double>"),
          (r, c) => r + c).as("embedding"))
  }

  /** Compact a doubly-drifted IVFADC index: re-Lloyd the coarse
    * centroids over the RECONSTRUCTED corpus (current centroids as the
    * warm start — [[compactIvfIndex]]'s discipline, the lists are the
    * corpus projection so nothing is re-read or re-embedded), then
    * re-train the residual codebooks under the new assignment and
    * re-encode every entry.
    *
    * Unlike the int8 [[compactIvfIndex]] (a pure relabel — its payload
    * is centroid-independent), PQ compaction RE-QUANTIZES: codes are
    * residuals against the coarse centroid, so moving an entry to a
    * new list invalidates its codes by construction. Each compaction
    * therefore adds one generation of PQ reconstruction noise
    * (compact-of-compact quantizes an already-quantized vector — the
    * generation-loss tape-copy shape). The contract is accordingly
    * evidence-driven, not scheduled: run it from
    * [[maintainIvfPqIndex]] when measured recall decays below floor,
    * and when the float corpus is being re-scanned anyway, prefer a
    * fresh [[buildIvfPqIndex]] — compaction is for when the lists are
    * the only corpus projection at hand (the nightly-maintenance
    * reality at 100 TB, where re-embedding is the expensive step).
    *
    * Validity precondition: the stored codes must actually BE a
    * faithful corpus projection — which holds exactly when every
    * appended batch passed [[pqBatchError]]'s gate (see
    * [[maintainIvfPqIndex]]). Compacting an index that absorbed a
    * codebook-decayed batch re-clusters the collapsed reconstructions,
    * cementing the loss instead of recovering it.
    *
    * Zero-norm reconstructions (every codeword zero) are dropped by
    * [[pqResiduals]]'s assignment contract — they have no cosine
    * direction and [[probeIvfPq]]'s `__n2 > 0` filter could never
    * return them anyway. Duplicate list ids fail loudly in
    * [[reconstructPq]].
    */
  def compactIvfPqIndex(
      index: IvfPqIndex,
      iterations: Int = 2,
      kmeansIterations: Int = 2): IvfPqIndex = {
    require(iterations >= 1,
      s"codebook re-train needs >= 1 sweep, got $iterations")
    require(kmeansIterations >= 1,
      s"compaction without Lloyd sweeps is a no-op, got $kmeansIterations")
    val (numSubspaces, subDim) = pqShape(index.codebooks)
    val codebookSize = index.codebooks.agg(max(col("cid")).cast("int"))
      .collect()(0).getInt(0) + 1
    // staged once: the Lloyd sweeps, the residual pass, and the encode
    // all re-read the reconstruction. Zero-norm reconstructions (codes
    // summing exactly to the coarse centroid's negation) are filtered
    // BEFORE the Lloyd sweeps — kmeansCentroids' cosine assignment
    // divides by the norm, so an unfiltered zero row is an ANSI
    // DIVIDE_BY_ZERO (pqResiduals' own filter runs too late for this).
    val recon = reconstructPq(index)
      .filter(dot(col("embedding"), col("embedding")) > 0)
      .transform(Persist.round)
    val cents = kmeansCentroids(recon, index.centroids, kmeansIterations)
    val resid = pqResiduals(recon, cents, "vec_id", "embedding")
    val cb = pqTrainCodebooks(resid, numSubspaces * subDim, numSubspaces,
      codebookSize, iterations, idCol = "neighbor_id", vecCol = "__r")
    IvfPqIndex(cents, cb, encodePqLists(resid, cb))
  }

  /** Relative residual quantization error of a float batch under FIXED
    * quantizers: Σ‖r − q(r)‖² / Σ‖r‖² over the batch, where r is each
    * vector's coarse residual and q(r) its codeword reconstruction —
    * the energy fraction the codebooks would DESTROY if this batch were
    * appended. 0 = codes are lossless on this batch; → 1 = the
    * reconstruction collapses to the coarse centroid (the decayed-
    * codebook signature: the vector becomes unreachable garbage while
    * every stored byte still "looks" valid). Exactly measurable at
    * append time — the one moment the floats are in hand — and
    * batch-sized: one assignment + encode pass, one scalar collected.
    */
  def pqBatchError(
      batch: DataFrame,
      centroids: DataFrame,
      codebooks: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Double = {
    val (numSubspaces, subDim) = pqShape(codebooks)
    val resid = pqResiduals(batch, centroids, idCol, vecCol)
    val cb = broadcast(codebooks.select(col("m"), col("cid").as("code"),
      col("__cv").cast("array<double>").as("__cw")))
    val rhat = pqEncode(resid, codebooks, numSubspaces * subDim,
        idCol = "neighbor_id", vecCol = "__r")
      .select(col("neighbor_id"), posexplode(col("codes")).as(Seq("m", "code")))
      .join(cb, Seq("m", "code"))
      .groupBy(col("neighbor_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("m"), col("__cw")))),
        s => s.getField("__cw"))).as("__rhat"))
    val row = resid.join(rhat, Seq("neighbor_id"))
      .agg(sum(l2sq(col("__r"), col("__rhat"))).as("err"),
        sum(dot(col("__r"), col("__r"))).as("energy"))
      .collect()(0)
    if (row.isNullAt(1) || row.getDouble(1) == 0.0) 0.0
    else row.getDouble(0) / row.getDouble(1)
  }

  /** One [[maintainIvfPqIndex]] pass: what happened, and the evidence
    * it acted on. `rebuildNeeded` means the batch was REFUSED — its
    * quantization error says the frozen codebooks cannot encode it,
    * so appending would silently destroy it; re-run
    * [[buildIvfPqIndex]] over the corpus + held batches instead.
    */
  final case class PqMaintenanceReport(
      appended: Long, batchError: Double, rebuildNeeded: Boolean,
      recallBefore: Double, compacted: Boolean, recallAfter: Double)

  /** Decay-triggered IVFADC maintenance — [[maintainIvfIndex]]'s
    * cadence recipe at the PQ rung, where decay is DOUBLE and the two
    * modes need different responses:
    *
    *  1. **Codebook decay** (PQ-specific): a distribution-shifted
    *     batch's residuals fall outside what the frozen codebooks were
    *     trained on, so its codes reconstruct near the coarse centroid
    *     — the vectors become unreachable garbage, invisibly (every
    *     stored byte still parses; measured on the gate fixture the
    *     appended mode's reconstructions rank BELOW base noise).
    *     Caught by [[pqBatchError]] BEFORE the append, the one moment
    *     the floats are in hand: error > `errorCeiling` → the batch is
    *     REFUSED (`rebuildNeeded` = true, nothing written) because no
    *     lists-only operation can recover information the encode would
    *     destroy — re-train from floats ([[buildIvfPqIndex]]) is the
    *     only honest fix. This gate is also what keeps every OTHER
    *     maintenance step valid: since every appended batch passed it,
    *     the stored codes remain a faithful corpus projection, which
    *     is exactly the license [[compactIvfPqIndex]] and the recall
    *     measurement below need to operate from lists alone.
    *  2. **Coarse decay** (shared with the int8 index): well-encoded
    *     appends still split new modes across frozen list boundaries,
    *     so narrow probes miss cross-list neighbors. Measured after
    *     the append as mean recall@k of the probed-list ADC against
    *     brute force over the index's own reconstruction (the quantity
    *     a frozen coarse quantizer erodes — valid ground truth BECAUSE
    *     of gate 1), recovered by [[compactIvfPqIndex]] + rewrite when
    *     it decays below `recallFloor`.
    *
    * Cost per pass: the batch-sized error measurement (+ encode/append
    * when accepted) + one |probes| × |reconstructed lists| scan
    * (probes are held-out and metadata-sized by contract) and, when
    * compaction triggers, the re-cluster sweeps plus one full lists
    * rewrite (entries change lists AND codes — a rewrite is the
    * operation). The re-encoded lists are staged before the overwrite
    * — the compacted plan reads the very files the write replaces.
    * Only scalars are collected.
    */
  def maintainIvfPqIndex(
      spark: SparkSession,
      path: String,
      batch: DataFrame,
      probes: DataFrame,
      recallFloor: Double,
      errorCeiling: Double = 0.5,
      k: Int = 5,
      nprobe: Int = 1,
      iterations: Int = 2,
      kmeansIterations: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): PqMaintenanceReport = {
    require(recallFloor > 0.0 && recallFloor <= 1.0,
      s"recallFloor must be in (0, 1], got $recallFloor")
    require(errorCeiling > 0.0 && errorCeiling < 1.0,
      s"errorCeiling must be in (0, 1), got $errorCeiling")
    def meanRecall(index: IvfPqIndex): Double = {
      val recon = reconstructPq(index)
        .select(col("vec_id").as(idCol), col("embedding").as(vecCol))
      val exact = bruteForceTopK(recon, probes, k, idCol, vecCol)
      val approx = probeIvfPq(index, probes, k, nprobe, idCol, vecCol)
      val row = recallAtK(approx, exact).agg(avg(col("recall"))).collect()(0)
      // Fail loud on a degenerate probe set: an empty (or all-zero-norm)
      // probes frame averages to NULL, which would otherwise surface as
      // an opaque NPE instead of naming the contract.
      require(!row.isNullAt(0),
        "maintainIvfPqIndex: probes produced no recall rows — the " +
          "probes frame must contain at least one non-zero-norm vector")
      row.getDouble(0)
    }
    val toAppend = batch.count()
    // one read of the quantizer halves per pass (VERDICT r19 nit #3):
    // centroids/codebooks are immutable below — only the lists change
    // on append, so only they re-read
    val stored = readIvfPqIndex(spark, path)
    val batchError = if (toAppend > 0L) {
      pqBatchError(batch, stored.centroids, stored.codebooks, idCol, vecCol)
    } else 0.0
    if (batchError > errorCeiling) {
      // gate 1 trips: nothing written — the recall of the UNTOUCHED
      // index is still reported so the operator sees the full picture
      val r = meanRecall(stored)
      PqMaintenanceReport(0L, batchError, rebuildNeeded = true,
        recallBefore = r, compacted = false, recallAfter = r)
    } else {
      if (toAppend > 0L) {
        appendToStoredIvfPqIndex(spark, path, batch, idCol, vecCol)
      }
      val grown = IvfPqIndex(stored.centroids, stored.codebooks,
        spark.read.parquet(s"$path/lists"))
      val before = meanRecall(grown)
      if (before >= recallFloor) {
        PqMaintenanceReport(toAppend, batchError, rebuildNeeded = false,
          before, compacted = false, before)
      } else {
        val compacted = compactIvfPqIndex(grown, iterations, kmeansIterations)
        // stage before overwrite: the re-encoded plan reads the files
        // the write replaces (the maintainIvfIndex discipline)
        val staged = IvfPqIndex(compacted.centroids, compacted.codebooks,
          compacted.lists.transform(Persist.round))
        writeIvfPqIndex(staged, path)
        val after = meanRecall(readIvfPqIndex(spark, path))
        PqMaintenanceReport(toAppend, batchError, rebuildNeeded = false,
          before, compacted = true, after)
      }
    }
  }

  /** Mean-center a vector column: subtract the per-position corpus mean
    * (computed exactly as [[centroidOutliers]]'s centroid — posexplode →
    * grouped avg, each coordinate rounded to 6 decimals so the result is
    * engine- and partitioning-stable), cast back to float. Cosine over
    * centered vectors is corpus-correlation — for HISTOGRAM-type
    * features this removes the shared component that makes every payload
    * of one modality look alike (every text payload carries its
    * language's letter distribution, so raw byte-histogram cosines sit
    * at ≈ 0.99 corpus-wide and no threshold separates near-dups from
    * background; centered, the doc-specific DEVIATIONS are compared —
    * background pairs fall toward 0 while near-identical payloads stay
    * ≈ 1). One corpus scan + one dim-sized aggregate + a metadata
    * broadcast — scan-speed at 100 TB.
    */
  private def centerVectors(df: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val e = df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val cent = e.select(posexplode(col("__v")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(round(avg(col("x")), 6).as("c"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("__cent"))
    e.crossJoin(broadcast(cent))
      .select(col(idCol),
        zip_with(col("__v"), col("__cent"), (v, c) => v - c)
          .cast("array<float>").as(vecCol))
  }

  /** Multimodal near-duplicate pairs — the composition a multimodal
    * curation pipeline runs for image/frame dedup (the r8 ask):
    * [[Multimodal.extractFeatures]] histogram vectors → mean-centering
    * ([[centerVectors]] — see its scaladoc for why raw histogram cosine
    * cannot work) → banded hyperplane-LSH candidates → EXACT centered
    * cosine verify ≥ `threshold` ([[hyperplaneNearDupPairs]]).
    *
    * Input: (doc_id, media, format) blobs; output (doc_a, doc_b, sim),
    * doc_a < doc_b. Same scale shape as the text/embedding dedup
    * family: features are fixed-width (blobs never shuffle), candidates
    * are bucket-join-bounded, and the exact verify touches only
    * candidate pairs. Recall contract (q139 + SimilaritySpec, with a
    * negative control): full recall on near-identical payloads at the
    * default band geometry — a pair at centered cosine ≥ 0.99 is missed
    * with p < 1e-4 (Charikar; see [[hyperplaneNearDupPairs]]).
    */
  /** Centered histogram features — the shared feature stage of the
    * media near-dup family (one definition; the LSH path and its exact
    * ground-truth twin must never drift apart).
    */
  private def centeredMediaFeatures(blobs: DataFrame, dims: Int): DataFrame =
    centerVectors(Multimodal.extractFeatures(blobs, dims),
      "doc_id", "feature")

  def mediaNearDupPairs(
      blobs: DataFrame,
      threshold: Double,
      dims: Int = 64,
      bands: Int = 8,
      rowsPerBand: Int = 12,
      seed: Long = 42L): DataFrame =
    hyperplaneNearDupPairs(centeredMediaFeatures(blobs, dims),
      threshold, bands, rowsPerBand, seed, idCol = "doc_id",
      vecCol = "feature")
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"), col("sim"))

  /** Exact all-pairs twin of [[mediaNearDupPairs]] (same features, same
    * centering, blocked O(N²) self-join) — the ground truth its recall
    * gate (q139) measures against; fixture-sized use only.
    */
  def mediaNearDupExact(
      blobs: DataFrame,
      threshold: Double,
      dims: Int = 64): DataFrame =
    cosineNearDupPairs(centeredMediaFeatures(blobs, dims),
      threshold, idCol = "doc_id", vecCol = "feature")
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"), col("sim"))

  /** Media GROUP dedup — [[semanticDedup]]'s composition for multimodal
    * payloads (the image/frame-dedup action a curation pipeline takes
    * on [[mediaNearDupPairs]]' evidence): LSH pairs over centered
    * histogram features → connected components
    * ([[Dedup.nearDupClusters]] label propagation) → min-id canonical
    * per group. One row per input payload: (doc_id, canonical, kept) —
    * filtering on `kept` is the dedup, keeping the mapping is the
    * lineage record. Scale notes inherit from the parts: candidates
    * bucket-join-bounded, clustering one shuffle per sweep with
    * checkpointed lineage, blobs never shuffle (fixed-width features
    * do).
    */
  def mediaDedup(
      blobs: DataFrame,
      threshold: Double,
      dims: Int = 64,
      bands: Int = 8,
      rowsPerBand: Int = 12,
      seed: Long = 42L): DataFrame = {
    val pairs = mediaNearDupPairs(blobs, threshold, dims, bands,
        rowsPerBand, seed)
      .select(col("doc_a"), col("doc_b"))
    val clusters = Dedup.nearDupClusters(pairs)
    blobs.select(col("doc_id"))
      .join(clusters, col("doc_id") === clusters("id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("canonical"))
      .withColumn("kept", col("doc_id") === col("canonical"))
  }

  /** Pair-set recall of an approximate near-dup pass against the exact
    * one — [[recallAtK]]'s analogue for unordered pair output ((a, b)
    * keys instead of ranked per-query lists). One row:
    * (n_exact, n_approx, n_matched, recall); recall = 1.0 when `exact`
    * is empty (nothing to find). Both inputs are candidate-bounded pair
    * frames, so this costs nothing next to the passes it audits.
    */
  def pairRecall(approx: DataFrame, exact: DataFrame,
      keys: Seq[String] = Seq("doc_a", "doc_b")): DataFrame = {
    val a = approx.select(keys.map(col): _*)
    val e = exact.select(keys.map(col): _*)
    val m = e.join(a, keys, "left_semi")
    e.agg(count(lit(1)).as("n_exact"))
      .crossJoin(a.agg(count(lit(1)).as("n_approx")))
      .crossJoin(m.agg(count(lit(1)).as("n_matched")))
      .select(col("n_exact"), col("n_approx"), col("n_matched"),
        round(when(col("n_exact") === 0, 1.0)
          .otherwise(col("n_matched").cast("double") /
            col("n_exact").cast("double")), 4).as("recall"))
  }

  // ───────────────────────── OPQ (Ge et al., CVPR 2013) ──────────────

  /** Apply a dim×dim rotation to a vector column: y_k = Σ_j R(k)(j)·x_j
    * (rows of `rotation` are output coordinates). The matrix ships as a
    * literal — a few KB at any realistic dim — and the multiply is one
    * per-row expression tree, no join, no shuffle. Output is
    * array<double> (the PQ training input type).
    */
  def applyRotation(df: DataFrame, rotation: Seq[Seq[Double]],
      vecCol: String = "embedding"): DataFrame = {
    require(rotation.nonEmpty &&
      rotation.forall(_.size == rotation.size),
      s"rotation must be square, got ${rotation.size} rows of sizes " +
        rotation.map(_.size).distinct.mkString(","))
    // row · vec through the codegen'd dot kernel (round 21): the
    // zip_with+aggregate formulation is interpreted — per-element
    // lambda dispatch and boxing, dim² applications per row — and the
    // kernel is documented bit-identical to it (same left-to-right
    // double accumulation), so every rotated coordinate is unchanged.
    df.withColumn(vecCol, transform(typedLit(rotation), row =>
      dot(row, col(vecCol).cast("array<double>"))))
  }

  /** Relative flat-PQ reconstruction error: Σ‖x − x̂‖² / Σ‖x‖² over the
    * frame, x̂ = the codeword reconstruction of x under `codebooks` —
    * [[pqBatchError]] without the coarse-residual stage; the
    * quantization-quality number the OPQ gate compares across
    * rotations. One encode pass + one scalar collected.
    */
  def pqReconstructionError(emb: DataFrame, codebooks: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Double = {
    val (numSubspaces, subDim) = pqShape(codebooks)
    val recon = pqReconstruct(
      pqEncode(emb, codebooks, numSubspaces * subDim, idCol, vecCol),
      codebooks, idCol)
    val row = emb
      .select(col(idCol), col(vecCol).cast("array<double>").as("__x"))
      .join(recon, Seq(idCol))
      .agg(sum(l2sq(col("__x"), col("__rhat"))).as("err"),
        sum(dot(col("__x"), col("__x"))).as("energy"))
      .collect()(0)
    if (row.isNullAt(1) || row.getDouble(1) == 0.0) 0.0
    else row.getDouble(0) / row.getDouble(1)
  }

  /** Codeword reconstruction of a codes frame: (idCol, __rhat), the
    * [[pqBatchError]] assembly shared with [[pqReconstructionError]]
    * and the OPQ Procrustes step.
    */
  private def pqReconstruct(codes: DataFrame, codebooks: DataFrame,
      idCol: String): DataFrame = {
    // per-row codeword lookup against the literal codebooks (round 21):
    // the explode → broadcast join → collect_list re-assembly produced
    // the same flatten-in-m-order array with one shuffle; identical
    // codeword doubles (same float→double widening), zero shuffles.
    val cbLit = codebookLit(codebooks)
    codes.select(col(idCol),
      flatten(transform(col("codes"),
        (code, m) => element_at(element_at(cbLit, m + 1), code + 1)))
        .as("__rhat"))
  }

  /** Optimized-Product-Quantization rotation (Ge et al., CVPR 2013,
    * the non-parametric alternation §3.1) — the accuracy rung above
    * IVFADC at IDENTICAL memory: learn an orthogonal R so that PQ on
    * R·x destroys less energy than PQ on x (classic win: variance
    * concentrated in one subspace is re-balanced across all of them —
    * by AM-GM, pairing a σ_big with a σ_small in each subspace beats
    * pairing bigs together). Alternation: (1) fix R, train codebooks
    * on the rotated corpus; (2) fix the codes, R ← the orthogonal
    * Procrustes solution argmin_R Σ‖R·x − x̂‖² = the polar factor of
    * M = Σ x̂ xᵀ (computed here by the Newton polar iteration
    * Q ← (Q + Q⁻ᵀ)/2, globally quadratically convergent for
    * nonsingular M — Higham 1986 — on the dim×dim DRIVER-side matrix;
    * dim² doubles is metadata, the collect-a-sketch class). Each
    * alternation step is non-increasing in quantization error, the
    * published guarantee.
    *
    * Scale shape: per iteration, one PQ train (the
    * [[pqTrainCodebooks]] cost), one encode, and the cross-covariance
    * aggregate — which explodes dim² products per row; at corpus scale
    * run this on a TRAINING SAMPLE (the published practice: OPQ
    * rotations are trained on 10⁵–10⁶ vectors, then applied
    * everywhere), and the whole loop is sample-sized. Determinism:
    * the cross-covariance entries are distributed double sums, so they
    * are rounded at 10⁻⁶ before the driver-side polar iteration (the
    * centroid-rounding convention) — the rotation is then a pure
    * function of the rounded matrix.
    *
    * @return the rotation as dim rows of dim doubles — feed
    *         [[applyRotation]] on corpus AND queries, then any PQ rung.
    */
  def opqRotation(emb: DataFrame, dim: Int, numSubspaces: Int = 8,
      codebookSize: Int = 16, iterations: Int = 3, pqIterations: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : Seq[Seq[Double]] = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(numSubspaces >= 1 && dim % numSubspaces == 0,
      s"dim $dim must divide into numSubspaces $numSubspaces")
    val base = emb.select(col(idCol),
      col(vecCol).cast("array<double>").as(vecCol))
    // Parametric init (Ge §3.3, OPQ-P): PCA + eigenvalue allocation.
    // Starting the alternation from identity is a SADDLE — axis-aligned
    // codebooks are self-consistent (the Procrustes step returns ≈ I
    // when the codes were trained at I), so the published init is what
    // actually escapes the adversarial groupings: rotate to the
    // principal axes, then deal the directions to subspaces balancing
    // the per-subspace eigenvalue PRODUCTS (greedy on log-sums), so no
    // subspace hoards the variance.
    var r: Array[Array[Double]] = {
      // count + dim validation in ONE pass (ADVICE r20: a short vector
      // silently left zero rows in the covariance — degenerate PCA far
      // from the cause — and a long one threw an opaque driver-side
      // ArrayIndexOutOfBounds; fail loudly here instead)
      val hdr = base.agg(count(lit(1)),
        min(size(col(vecCol))), max(size(col(vecCol)))).collect()(0)
      val n = hdr.getLong(0).toDouble
      require(n > 0.0, "opqRotation: empty training frame")
      require(hdr.getInt(1) == dim && hdr.getInt(2) == dim,
        s"opqRotation: expected dim-$dim vectors, got sizes " +
          s"${hdr.getInt(1)}..${hdr.getInt(2)}")
      val mu = new Array[Double](dim)
      base.select(posexplode(col(vecCol)).as(Seq("i", "x")))
        .groupBy(col("i")).agg(round(avg(col("x")), 6).as("m"))
        .collect().foreach(e => mu(e.getInt(0)) = e.getDouble(1))
      // raw second moment, centered on the driver: C = S/n − μμᵀ.
      // Row i's sums Σ xi·x_j come from ONE posexplode with dim sum
      // columns (round 21) — the earlier explode-of-the-explode
      // materialized N×dim² rows to express the same multiply-adds;
      // this shape runs the identical arithmetic over N×dim rows
      // (entries are 10⁻⁶-rounded either way before the driver eigen
      // step, the documented determinism edge).
      val s = Array.ofDim[Double](dim, dim)
      val sCols = (0 until dim).map(j =>
        round(sum(col("xi") * col("__x")(j)), 6).as(s"c$j"))
      base.select(posexplode(col(vecCol)).as(Seq("i", "xi")),
          col(vecCol).as("__x"))
        .groupBy(col("i"))
        .agg(sCols.head, sCols.tail: _*)
        .collect()
        .foreach { e =>
          val i = e.getInt(0)
          (0 until dim).foreach(j => s(i)(j) = e.getDouble(j + 1))
        }
      val cov = Array.tabulate(dim, dim)(
        (i, j) => s(i)(j) / n - mu(i) * mu(j))
      val (eigVals, eigVecs) = jacobiEigen(cov)
      // deal eigen-directions (desc by eigenvalue) to subspaces,
      // always to the subspace with the smallest log-product so far
      val subDim = dim / numSubspaces
      val order = eigVals.indices.sortBy(k => (-eigVals(k), k))
      val logProd = new Array[Double](numSubspaces)
      val fill = new Array[Int](numSubspaces)
      val slotOf = new Array[Int](dim) // eigen rank -> output row
      order.zipWithIndex.foreach { case (k, rank) =>
        val s0 = (0 until numSubspaces)
          .filter(fill(_) < subDim)
          .minBy(ss => (logProd(ss), ss))
        slotOf(rank) = s0 * subDim + fill(s0)
        fill(s0) += 1
        logProd(s0) += math.log(math.max(eigVals(k), 1e-12))
      }
      val init = Array.ofDim[Double](dim, dim)
      order.zipWithIndex.foreach { case (k, rank) =>
        for (j <- 0 until dim) init(slotOf(rank))(j) = eigVecs(j)(k)
      }
      init
    }
    for (_ <- 1 to iterations) {
      val rotated = applyRotation(base, r.map(_.toSeq).toSeq, vecCol)
        .transform(Persist.round) // train + encode both read it
      val cb = pqTrainCodebooks(rotated, dim, numSubspaces, codebookSize,
        pqIterations, idCol, vecCol)
      val recon = pqReconstruct(
        pqEncode(rotated, cb, dim, idCol, vecCol), cb, idCol)
      // M[i][j] = Σ_rows x̂_i · x_j  (x = the ORIGINAL vector: R is
      // absolute, re-solved from scratch each alternation) — the same
      // single-explode + dim-sum-columns shape as the covariance pass
      // above (round 21: no N×dim² row materialization)
      val mCols = (0 until dim).map(j =>
        round(sum(col("xi") * col("__x")(j)), 6).as(s"c$j"))
      val entries = base.join(recon, Seq(idCol))
        .select(posexplode(col("__rhat")).as(Seq("i", "xi")),
          col(vecCol).as("__x"))
        .groupBy(col("i"))
        .agg(mCols.head, mCols.tail: _*)
        .collect()
      val m = Array.ofDim[Double](dim, dim)
      entries.foreach { e =>
        val i = e.getInt(0)
        (0 until dim).foreach(j => m(i)(j) = e.getDouble(j + 1))
      }
      r = polarFactor(m)
    }
    r.map(_.toSeq).toSeq
  }

  /** Classic cyclic-Jacobi eigendecomposition of a symmetric matrix
    * (driver-side, dim×dim — metadata class): returns (eigenvalues,
    * eigenvectors as COLUMNS of the second array). Deterministic given
    * the (rounded) input; sweeps until every off-diagonal is below
    * 1e-12 of the norm.
    */
  private def jacobiEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone)
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    val tol = 1e-12 * math.max(1.0,
      math.sqrt(a.map(_.map(x => x * x).sum).sum))
    var sweep = 0
    var off = Double.MaxValue
    while (off > tol && sweep < 100) {
      off = 0.0
      for (p <- 0 until n - 1; q <- p + 1 until n) {
        off = math.max(off, math.abs(a(p)(q)))
        if (math.abs(a(p)(q)) > tol / n) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) /
            (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
              case 0.0 => 1.0 // theta == 0 -> 45° rotation
              case x => x
            }
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s0 = t * c
          for (k <- 0 until n) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s0 * akq
            a(k)(q) = s0 * akp + c * akq
          }
          for (k <- 0 until n) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s0 * aqk
            a(q)(k) = s0 * apk + c * aqk
          }
          for (k <- 0 until n) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s0 * vkq
            v(k)(q) = s0 * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Orthogonal polar factor of a nonsingular square matrix by the
    * Newton iteration Q ← (Q + Q⁻ᵀ)/2 (Higham 1986): the closest
    * orthogonal matrix, equal to U·Vᵀ of the SVD — exactly the
    * orthogonal-Procrustes maximizer of tr(RᵀM). Fails loudly on a
    * singular input (a degenerate cross-covariance means the
    * reconstruction collapsed — train on a denser sample).
    */
  private def polarFactor(m: Array[Array[Double]]): Array[Array[Double]] = {
    val n = m.length
    def inverse(a: Array[Array[Double]]): Array[Array[Double]] = {
      val w = a.map(_.clone)
      val inv = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
      for (c <- 0 until n) {
        val p = (c until n).maxBy(r0 => math.abs(w(r0)(c)))
        require(math.abs(w(p)(c)) > 1e-12,
          "opqRotation: singular cross-covariance — the Procrustes " +
            "update is undefined; train the rotation on a denser sample")
        if (p != c) { val t = w(p); w(p) = w(c); w(c) = t
          val t2 = inv(p); inv(p) = inv(c); inv(c) = t2 }
        val d = w(c)(c)
        for (j <- 0 until n) { w(c)(j) /= d; inv(c)(j) /= d }
        for (r0 <- 0 until n if r0 != c) {
          val f = w(r0)(c)
          if (f != 0.0) for (j <- 0 until n) {
            w(r0)(j) -= f * w(c)(j); inv(r0)(j) -= f * inv(c)(j)
          }
        }
      }
      inv
    }
    val fro = math.sqrt(m.map(_.map(x => x * x).sum).sum)
    require(fro > 0.0, "opqRotation: zero cross-covariance")
    var q = m.map(_.map(_ / fro))
    var delta = Double.MaxValue
    var it = 0
    while (delta > 1e-13 && it < 100) {
      val invT = inverse(q)
      val next = Array.tabulate(n, n)((i, j) => 0.5 * (q(i)(j) + invT(j)(i)))
      delta = (0 until n).map(i => (0 until n)
        .map(j => math.abs(next(i)(j) - q(i)(j))).max).max
      q = next
      it += 1
    }
    q
  }
}
