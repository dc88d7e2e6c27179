package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution (Fellegi & Sunter, JASA 1969;
  * Christen, "Data Matching", Springer 2012): find the records that
  * describe the same real-world entity across noisy re-entries — the
  * structured-data sibling of the document near-dup family, and the
  * operator a training-data pipeline runs over user/author/site tables
  * before they become join keys. Three stages, each swappable:
  *
  *  1. CANDIDATE GENERATION by blocking — standard equality blocks
  *     ([[matchPairs]]) or sorted neighborhood ([[sortedNeighborhoodPairs]]).
  *     All-pairs comparison is O(n²) and dead at corpus scale; blocking
  *     bounds the comparison volume by construction.
  *  2. PAIRWISE VERIFICATION — a caller predicate over the aliased pair
  *     (`a.*` / `b.*`): edit distance on fuzzy fields, exact agreement on
  *     reliable ones (the Fellegi–Sunter agreement vector, collapsed to a
  *     boolean here; thread a scoring Column through the same hook for
  *     the weighted variant).
  *  3. TRANSITIVE CLUSTERING — [[Dedup.nearDupClusters]]'s min-label
  *     connected components over the verified match edges, then every
  *     record maps to its entity (singletons map to themselves), with the
  *     entity size alongside ([[resolveEntities]]).
  *
  * Scale shape: candidate pairs carry only (id_a, id_b) out of the
  * verify join; the clustering shuffles the (sparse) match graph, never
  * the record table; the final mapping is two id/entity-keyed joins.
  * Records should enter as a NARROW projection (id + blocking + verify
  * attributes) — heavy payload columns join back by id afterwards.
  */
object Linkage {

  /** Verified candidate pairs under standard blocking: records agreeing
    * on every `blockCols` value are candidates (equality join — null
    * block keys generate no candidates, the SQL-join convention);
    * `verify` then keeps real matches. The predicate sees the pair as
    * aliases `a` and `b` — e.g.
    * `levenshtein(col("a.name"), col("b.name")) <= 2 &&
    *  col("a.acctbal") === col("b.acctbal")`.
    *
    * Blocking keys are DERIVED columns by design (Christen's blocking
    * key values): compute them onto the frame first (prefixes, lengths,
    * phonetic codes, geohashes), don't reuse raw attributes unless they
    * really are reliable.
    *
    * `maxBlock` (0 = off) drops blocks larger than the cap before the
    * self-join — the q73 hot-bucket discipline: a degenerate key value
    * (empty name, default date) otherwise costs |block|² comparisons
    * while carrying no linkage evidence. Hot keys are FEW by definition,
    * so the cap rides a broadcast anti-join; dropped blocks mean dropped
    * candidate RECALL, which is the documented production trade — tighten
    * the key instead if those blocks matter.
    *
    * @return (doc_a, doc_b) with doc_a < doc_b — feeds
    *         [[Dedup.nearDupClusters]] / [[resolveEntities]] directly.
    */
  def matchPairs(records: DataFrame, idCol: String, blockCols: Seq[String],
      verify: Column, maxBlock: Int = 0): DataFrame =
    blockedCandidates(records, idCol, blockCols, maxBlock)
      .filter(verify)
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))

  /** [[matchPairs]] with a GRADED comparator instead of a boolean one —
    * the Fellegi–Sunter agreement weight collapsed to one similarity
    * Column (e.g. [[graft.functions.StringSimilarityFunctions
    * .jaroWinkler]] on the fuzzy field): keeps candidates with
    * `score >= threshold` that also satisfy `agree` (exact-agreement
    * conjuncts), and carries the score out for ranking / clerical-review
    * routing.
    *
    * @return (doc_a, doc_b, score) with doc_a < doc_b
    */
  def scoredMatchPairs(records: DataFrame, idCol: String,
      blockCols: Seq[String], score: Column, threshold: Double,
      agree: Column = lit(true), maxBlock: Int = 0): DataFrame =
    blockedCandidates(records, idCol, blockCols, maxBlock)
      .withColumn("__score", score)
      .filter(col("__score") >= threshold && agree)
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        col("__score").as("score"))

  /** The actual Fellegi–Sunter decision model over blocked candidates:
    * each field contributes its log-odds agreement weight — log2(m/u)
    * on agreement, log2((1−m)/(1−u)) on disagreement, where m = P(field
    * agrees | true match) and u = P(field agrees | non-match) — and the
    * summed weight lands each pair in one of THREE bands: `match`
    * (weight ≥ `upper`), `possible` (clerical review — the band the
    * 1969 model exists for: evidence worth a human, not an automatic
    * link), `non_match`. A conjunctive verify() collapses this to one
    * bit; the weights keep partial evidence (name agrees, balance
    * doesn't) visible and rankable.
    *
    * All candidates are returned with their weight and band — filter
    * `band =!= "non_match"` downstream; feeding only the `match` band
    * to [[resolveEntities]] reproduces the boolean pipeline, and the
    * `possible` band is the review queue. m/u are caller-estimated (in
    * production: EM over the agreement-vector counts; the estimation
    * loop is the q167 fixed-iteration shape if you need it fitted).
    *
    * @param fields (agreePredicate over aliases a/b, m, u) per field,
    *               each requiring 0 < u < m < 1 — a field where
    *               agreement isn't evidence (m ≤ u) doesn't belong in
    *               the model
    * @return (doc_a, doc_b, weight, band), doc_a < doc_b
    */
  def fsWeightedPairs(records: DataFrame, idCol: String,
      blockCols: Seq[String], fields: Seq[(Column, Double, Double)],
      upper: Double, lower: Double, maxBlock: Int = 0): DataFrame = {
    require(fields.nonEmpty, "the FS model needs at least one field")
    require(lower < upper, s"need lower < upper, got $lower >= $upper")
    fields.foreach { case (_, m, u) =>
      require(u > 0.0 && m < 1.0 && u < m,
        s"each field needs 0 < u < m < 1, got m=$m u=$u")
    }
    val weight = fields.map { case (agree, m, u) =>
      when(agree, log2(lit(m) / lit(u)))
        .otherwise(log2(lit(1.0 - m) / lit(1.0 - u)))
    }.reduce(_ + _)
    blockedCandidates(records, idCol, blockCols, maxBlock)
      .withColumn("weight", weight)
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"),
        col("weight"),
        when(col("weight") >= upper, "match")
          .when(col("weight") >= lower, "possible")
          .otherwise("non_match").as("band"))
  }

  private def blockedCandidates(records: DataFrame, idCol: String,
      blockCols: Seq[String], maxBlock: Int): DataFrame = {
    require(blockCols.nonEmpty, "blocking requires at least one key column")
    // both self-join sides (and the hot-block aggregate) read the
    // record projection — materialize the caller's derivation once (the
    // repeated-branch lesson: a records frame that is itself a
    // join/union pipeline would otherwise execute 2-3 times)
    val recs = records.transform(Persist.round)
    val base = if (maxBlock > 0) {
      val hot = recs.groupBy(blockCols.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > maxBlock)
        .drop("__n")
      recs.join(broadcast(hot), blockCols, "left_anti")
    } else recs
    val a = base.alias("a")
    val b = base.alias("b")
    val blockEq = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _)
    a.join(b, blockEq && col(s"a.$idCol") < col(s"b.$idCol"))
  }

  /** Verified candidate pairs under SORTED NEIGHBORHOOD (Hernández &
    * Stolfo, SIGMOD 1995): rank all records by `sortKey` (ties by id)
    * and compare each record only to the `window - 1` records after it.
    * The classic complement to equality blocking — catches pairs whose
    * blocking keys disagree but whose sort keys collide, and misses
    * pairs the sort order separates (that recall trade IS the method;
    * multi-pass over different sort keys is the standard mitigation).
    *
    * Scale shape — no single-task sort: the global rank is two-pass
    * (range-repartition by (sortKey, id), per-partition counts collected
    * once — partition-count-sized metadata — then partition-local
    * row_number + broadcast offsets), and the neighbor join is banded:
    * rank-bucket of width `window`, left side exploded to (own, next)
    * bucket so each in-window pair meets in exactly one bucket. Shuffles
    * are rank-bucket-keyed; no rank ever funnels through one task.
    */
  def sortedNeighborhoodPairs(records: DataFrame, idCol: String,
      sortKey: Column, window: Int, verify: Column): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    // both band-join sides read the ranked frame — without this the
    // rank window (an exchange + sort) executes twice
    val ranked = globalRank(records, idCol, sortKey).transform(Persist.round)
    val w = window.toLong
    val bkt = floor(col("__rank") / lit(w)).cast("long")
    // Band trick: a pair (i, j) with 1 <= j - i <= w-1 has bucket(j) in
    // {bucket(i), bucket(i)+1}; the i side emits both, the j side keeps
    // its own, so every in-window pair meets in EXACTLY one bucket (j's)
    // and nothing meets twice.
    val a = ranked
      .withColumn("__bkt", explode(array(bkt, bkt + 1L))).alias("a")
    val b = ranked.withColumn("__bkt", bkt).alias("b")
    a.join(b, col("a.__bkt") === col("b.__bkt") &&
        col("b.__rank") - col("a.__rank") >= 1L &&
        col("b.__rank") - col("a.__rank") <= lit(w - 1L))
      .filter(verify)
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
  }

  /** Global dense 0-based rank by (sortKey, id) without a single-task
    * sort: range-repartition on the full (unique) key, collect ONE
    * partition-count-sized row set of per-partition counts, then
    * partition-local row_number plus the broadcast cumulative offset.
    * Deterministic: the key (sortKey, id) is unique, so the total order
    * — and therefore every rank — is independent of where the sampled
    * range boundaries fall.
    */
  private[operators] def globalRank(records: DataFrame, idCol: String,
      sortKey: Column): DataFrame = {
    val keyed = records.withColumn("__sk", sortKey)
      .repartitionByRange(col("__sk"), col(idCol))
      .withColumn("__pid", spark_partition_id())
      // counts + ranks both read it; also pins the SAMPLED range
      // boundaries so the two actions can't see different partitionings
      // (ranks would still be correct either way — the key is unique —
      // but __pid/offset pairs must come from ONE partitioning)
      .transform(Persist.round)
    val counts = keyed.groupBy(col("__pid")).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (p, n)) =>
      (p, acc + n)
    }.tail.zip(counts).map { case ((p, end), (_, n)) => (p, end - n) }
    val offCol = offsets.foldLeft(lit(0L)) { case (acc, (p, off)) =>
      when(col("__pid") === p, off).otherwise(acc)
    }
    val wp = Window.partitionBy(col("__pid"))
      .orderBy(col("__sk"), col(idCol))
    keyed.withColumn("__rank", row_number().over(wp) - 1L + offCol)
      .drop("__pid", "__sk")
  }

  /** Incremental entity resolution — resolve a NEW batch against a
    * STORED entity table without re-clustering the corpus (the
    * incremental-dedup discipline: the stored side is never
    * re-shuffled beyond the blocked join, and existing entities never
    * change). Rules, in order:
    *
    *  1. a new record matching stored records joins the MINIMUM matched
    *     stored entity;
    *  2. new records matching each other cluster together (min-label
    *     components over the new-new match graph), and the whole
    *     cluster takes the minimum stored entity any member matched —
    *     so two re-entries of the same unseen entity can't split;
    *  3. a cluster with no stored match becomes a new entity labeled by
    *     its minimum new record id.
    *
    * Deliberate non-goal, documented like the dedup family's
    * incremental forms: evidence in the new batch that two EXISTING
    * entities are the same does NOT merge them — merging history is a
    * full [[resolveEntities]] re-run, not an append.
    *
    * `verify` sees alias `a` = the new side, `b` = the stored side for
    * new-stored matching, and both sides new for new-new matching —
    * write it over the shared attribute names.
    *
    * @param stored records WITH `entityCol` (e.g. [[resolveEntities]]
    *               output joined back to its attributes)
    * @return one row per new record: (rec_id, entity_id, from_stored)
    */
  def incrementalResolve(stored: DataFrame, newRecords: DataFrame,
      idCol: String, entityCol: String, blockCols: Seq[String],
      verify: Column, maxIterations: Int = 10): DataFrame = {
    // read by the new-stored join, the new-new self-join, and the id
    // projection — one materialization of the (narrow) batch
    val newRecs = newRecords.transform(Persist.round)
    val a = newRecs.alias("a")
    val b = stored.alias("b")
    val blockEq = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _)
    // min matched stored entity per new record (null = no stored match)
    val bestStored = a.join(b, blockEq).filter(verify)
      .groupBy(col(s"a.$idCol").as("__id"))
      .agg(min(col(s"b.$entityCol")).as("__se"))
    val nnPairs = matchPairs(newRecs, idCol, blockCols, verify)
    val clusters = Dedup.nearDupClusters(nnPairs, maxIterations)
    val ids = newRecs.select(col(idCol))
    val labeled = ids
      .join(clusters, ids(idCol) === clusters("id"), "left")
      .select(ids(idCol).as("__id"),
        coalesce(col("cluster"), ids(idCol)).as("__c"))
      .join(bestStored, Seq("__id"), "left")
    // min ignores nulls: a cluster's entity is its best stored match if
    // ANY member has one, else its min member id
    val byCluster = labeled.groupBy(col("__c"))
      .agg(min(col("__se")).as("__ce"), min(col("__id")).as("__cm"))
    labeled.select(col("__id"), col("__c"))
      .join(byCluster, Seq("__c"))
      .select(col("__id").as("rec_id"),
        coalesce(col("__ce"), col("__cm")).as("entity_id"),
        col("__ce").isNotNull.as("from_stored"))
  }

  /** Full entity-resolution mapping: every record of `records` with its
    * entity id (the minimum record id reachable through `pairs` — i.e.
    * [[Dedup.nearDupClusters]] over the match graph; records in no match
    * are their own entity) and the entity's member count.
    *
    * @param pairs verified match edges (doc_a, doc_b) from
    *              [[matchPairs]] / [[sortedNeighborhoodPairs]]
    * @return (rec_id, entity_id, n_members)
    */
  def resolveEntities(records: DataFrame, idCol: String,
      pairs: DataFrame, maxIterations: Int = 10): DataFrame = {
    val clusters = Dedup.nearDupClusters(pairs, maxIterations)
    val ids = records.select(col(idCol))
    val mapped = ids.join(clusters, ids(idCol) === clusters("id"), "left")
      .select(ids(idCol).as("rec_id"),
        coalesce(col("cluster"), ids(idCol)).as("entity_id"))
      // feeds the size aggregate AND the final join — one
      // materialization of a two-long-column frame, not two cluster
      // joins
      .transform(Persist.round)
    // entity cardinality ~ record cardinality: a keyed join, NOT a
    // broadcast
    val sizes = mapped.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_members"))
    mapped.join(sizes, Seq("entity_id"))
      .select(col("rec_id"), col("entity_id"), col("n_members"))
  }
}
