package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus→training-shards composition — every stage of
  * the LLM-data-pipeline surface chained under ONE call, because the
  * composed form is what a real user runs and pairwise gates cannot see
  * three-stage drift (the q90 precedent: its bugs surfaced only on
  * composition). Stages, each individually oracle-gated:
  *
  *  1. [[Curation.curate]] (q90) — exact-dup canonicals, benchmark
  *     decontamination, Gopher battery, quality score, repetition;
  *  2. [[Dedup.minhashNearDupPairs]] → [[Dedup.nearDupClusters]] →
  *     [[Sampling.leakageSafeSplit]] (q130) — near-dup components of the
  *     CURATED corpus key the split draw, train rows proceed;
  *  3. [[Sampling.domainMixPlan]] → [[Sampling.materializeMix]]
  *     (q101/q121) — observed train-token shares vs the target mix,
  *     epoch-replicated (doc, epoch) rows;
  *  4. [[Sampling.epochOrder]] (q131) — (id:epoch)-hashed deterministic
  *     training order: (shard, pos) coordinates;
  *  5. [[Sampling.packSequences]] (q78) in pos order per shard — the
  *     [[graft.sources.Layout.planTrainingShards]] layout generalized to
  *     the multi-epoch mix: (pack_id, pack_offset) per row.
  *
  * Output: one row per (document, epoch) with its full training-layout
  * coordinate — (idCol, domainCol, epoch, shard, pos, n_tokens, pack_id,
  * pack_offset). Every coordinate is a pure function of the input ids
  * and text: reproducible across engines, retries, and reruns.
  */
object TrainingPipeline {

  /** Scale shape, stage by stage: curation emits a narrow keep-list that
    * is materialized ONCE (localCheckpoint — id-width, corpus-cardinality,
    * the same discipline as [[Dedup.nearDupClusters]]' labels) because the
    * LSH stage re-scans its input ~3 times (its documented pass/cache
    * trade) — each pass re-reads the RAW corpus at scan speed and
    * re-joins the checkpointed ids instead of re-running curation. The
    * split/plan/mix joins are all broadcast (cluster table, grand total,
    * weight table are config- or pair-sized). Token counts ride a narrow
    * (id, n_tokens) shuffle join onto the mix rows. epochOrder and the
    * pack window both partition by `shard`, so stages 4+5 share one
    * exchange (the [[graft.sources.Layout.planTrainingShards]] plan
    * shape). Document text never shuffles anywhere: the only
    * corpus-sized shuffle keys are fingerprints, shingle projections,
    * and (id, token-count) pairs.
    *
    * A 100 TB run materializes the curated corpus between stages 1
    * and 2 rather than re-scanning raw input per LSH pass — pass
    * `stageDir` (round 16; see [[curatedMix]]) to take that path; the
    * default keeps the chain lazy so the whole layout is one plan.
    *
    * `maxBucket` (VERDICT r15 #2) threads the q73 hot-bucket cap into
    * the LSH stage: boilerplate/templated content floods its band
    * buckets and turns the candidate self-join quadratic — the exact
    * skew the capped [[Dedup.minhashNearDupPairs]] variant was built
    * for, and at 100 TB the NORM, not the edge case. The recall
    * argument is the cap's own (several bands per true pair; hot-bucket-
    * only pairs are template overlap the verify rejects anyway), and
    * the composed-chain gate (q147: a planted 60-doc boilerplate
    * cluster INSIDE the pipeline fixture, capped at 20) holds the full
    * exact-ground-truth oracle at both test scales. Default uncapped
    * only because a universal cap value does not exist — set it from
    * the corpus's bucket-size profile, as q147 does.
    */
  def corpusToShards(docs: DataFrame, benchmark: DataFrame,
      targets: Map[String, Double],
      textCol: String = "text", idCol: String = "doc_id",
      domainCol: String = "source",
      shards: Int = 8, budget: Long = 2048L,
      nearDupThreshold: Double = 0.8,
      maxBucket: Int = Int.MaxValue,
      stageDir: Option[String] = None): DataFrame = {
    shardLayout(curatedMix(docs, benchmark, targets, textCol, idCol,
      domainCol, nearDupThreshold, maxBucket, stageDir),
      idCol, domainCol, shards, budget)
  }

  /** Stages 4+5 — epoch-keyed order, then pack per shard in pos order;
    * both windows partition by shard → one exchange. Shared verbatim by
    * [[corpusToShards]] and [[crawlToShards]].
    */
  private def shardLayout(withTok: DataFrame, idCol: String,
      domainCol: String, shards: Int, budget: Long): DataFrame = {
    val ordered = Sampling.epochOrder(withTok, idCol, "epoch", shards)
    Sampling.packSequences(ordered, "n_tokens", budget, Seq("shard"), "pos")
      .select(col(idCol), col(domainCol), col("epoch"), col("shard"),
        col("pos"), col("n_tokens"), col("pack_id"), col("pack_offset"))
  }

  /** Stages 1–3 of the composition — curate → leakage-safe split → mix
    * plan/materialize — shared verbatim between [[corpusToShards]] (the
    * pretraining concat/pack layout) and [[corpusToBatches]] (the
    * fine-tuning padded-batch layout): one row per (document, epoch)
    * with (idCol, domainCol, epoch, n_tokens).
    *
    * `stageDir` (round 16) is the 100 TB knob the scaladoc above only
    * PRESCRIBED until now: when set, the curated corpus is written to
    * parquet there ([[graft.sources.Layout.writePartitioned]] without
    * partitioning — the chain re-keys by fingerprint/shard anyway) and
    * every downstream pass reads the materialized curated corpus
    * instead of re-running the raw scan + keep-list join per LSH pass
    * (~3×) plus once more per split/mix side. The default (None) keeps
    * the whole layout one lazy plan — right at gate scale, where the
    * extra write costs more than the re-scans it saves.
    */
  private def curatedMix(docs: DataFrame, benchmark: DataFrame,
      targets: Map[String, Double], textCol: String, idCol: String,
      domainCol: String, nearDupThreshold: Double,
      maxBucket: Int, stageDir: Option[String] = None): DataFrame = {
    // Stage 1 — curate; keep-list materialized once (narrow: ids only)
    val keepIds = Curation.curate(docs, benchmark, textCol, idCol)
      .filter(col("keep")).select(col(idCol))
      .transform(Persist.round)
    mixFromKeep(docs, keepIds, targets, textCol, idCol, domainCol,
      nearDupThreshold, maxBucket, stageDir)
  }

  /** Stages 2–3 over a caller-supplied keep-list — the curation stage is
    * pluggable (round 17): [[curatedMix]] feeds [[Curation.curate]]'s
    * keep-list, [[crawlToShards]] feeds [[Curation.curateWeb]]'s. The
    * keep-list must already be materialized (localCheckpoint) by the
    * caller — it is re-joined once per LSH pass.
    */
  private def mixFromKeep(docs: DataFrame, keepIds: DataFrame,
      targets: Map[String, Double], textCol: String, idCol: String,
      domainCol: String, nearDupThreshold: Double,
      maxBucket: Int, stageDir: Option[String] = None): DataFrame = {
    val kept = stageDir match {
      case None => docs.join(keepIds, Seq(idCol))
      case Some(dir) =>
        docs.join(keepIds, Seq(idCol))
          .select(col(idCol), col(domainCol), col(textCol))
          .write.mode("overwrite").parquet(dir)
        docs.sparkSession.read.parquet(dir)
    }
    // Stage 2 — near-dup components of the curated corpus key the split
    val pairs = Dedup.minhashNearDupPairs(kept, textCol, idCol,
      nearDupThreshold, maxBucket = maxBucket)
    val clusters = Dedup.nearDupClusters(pairs)
    val split = Sampling.leakageSafeSplit(
      kept.select(col(idCol), col(domainCol), col(textCol)), clusters, idCol)
    val train = split.filter(col("split") === "train")
    // Stage 3 — mix plan on observed TRAIN token shares, materialized.
    // The plan aggregate, the mix rows, and the token join all read the
    // train side: materialize ONE narrow (id, domain, n_tokens)
    // projection (round 22) instead of re-running the curation join +
    // cluster join + split hashing once per consumer (3 full pipeline
    // executions at gate scale; 3 corpus re-scans at 100 TB). Token
    // counts are a pure function of the text, computed once here —
    // values identical to the per-consumer recomputation.
    val tokens = TextAnalysis.tokenCount(col(textCol)).cast("long")
    val trainTok = train
      .select(col(idCol), col(domainCol), tokens.as("n_tokens"))
      .transform(Persist.round)
    val plan = Sampling.domainMixPlan(trainTok, domainCol,
      col("n_tokens"), targets)
    val mix = Sampling.materializeMix(
      trainTok.select(col(idCol), col(domainCol)), domainCol, plan, idCol)
    // token counts join the (doc, epoch) rows as a narrow pair frame
    mix.join(trainTok.select(col(idCol), col("n_tokens")), Seq(idCol))
  }

  /** [[corpusToShards]]' fine-tuning sibling (VERDICT r15 #3): the SAME
    * curated / leakage-safe-split / mixed corpus, laid out for a loader
    * that PADS each sequence to its batch's max instead of
    * concatenating — i.e. [[Sampling.bucketBatches]] (q148) composed
    * over stages 1–3 in place of epoch-order + pack. The batch draw is
    * keyed on the (id:epoch) composite — [[Sampling.epochOrder]]'s
    * convention — so a document's epoch copies scatter across batches
    * instead of padding side by side, and membership stays a pure
    * function of the ids.
    *
    * Output: one row per (document, epoch) with its full batch
    * coordinate and padding audit — (idCol, domainCol, epoch,
    * n_tokens, bucket, shard, batch_idx, pos_in_batch, padded_to,
    * pad_waste).
    *
    * Scale shape: stages 1–3 are [[corpusToShards]]' (see its
    * scaladoc); the batching stage adds exactly one narrow shuffle (the
    * (bucket, shard)-cell rank window over (key, n_tokens) rows) — the
    * q148 contract, with the same no-single-task-cell sharding.
    */
  def corpusToBatches(docs: DataFrame, benchmark: DataFrame,
      targets: Map[String, Double],
      textCol: String = "text", idCol: String = "doc_id",
      domainCol: String = "source",
      bucketWidth: Int = 64, batchSize: Int = 8, shards: Int = 4,
      nearDupThreshold: Double = 0.8,
      maxBucket: Int = Int.MaxValue,
      stageDir: Option[String] = None): DataFrame =
    batchLayout(curatedMix(docs, benchmark, targets, textCol, idCol,
      domainCol, nearDupThreshold, maxBucket, stageDir),
      idCol, domainCol, bucketWidth, batchSize, shards)

  /** The padded-batch layout stage over a (doc, epoch, n_tokens) mix —
    * shared verbatim by [[corpusToBatches]] and [[crawlToBatches]].
    */
  private def batchLayout(withTok: DataFrame, idCol: String,
      domainCol: String, bucketWidth: Int, batchSize: Int,
      shards: Int): DataFrame = {
    val keyed = withTok.withColumn("__bk",
      concat_ws(":", col(idCol).cast("string"), col("epoch").cast("string")))
    Sampling.bucketBatches(keyed, "n_tokens", bucketWidth, batchSize,
        shards, idCol = "__bk")
      .select(col(idCol), col(domainCol), col("epoch"), col("n_tokens"),
        col("bucket"), col("shard"), col("batch_idx"), col("pos_in_batch"),
        col("padded_to"), col("pad_waste"))
  }

  /** The end-to-end CRAWL→training-shards composition (VERDICT r16 #5):
    * [[corpusToShards]] with [[Curation.curateWeb]] (q163/q165) as the
    * front door — one call from a raw (id, url, text, domain) crawl
    * frame + benchmark + domain blocklist to the full training-layout
    * coordinates. The URL screens (blocklist, URL-dedup, spam-host) run
    * BEFORE any content stage touches text, exactly the order a real
    * crawl pipeline pays for them; everything downstream — near-dup
    * split keying, mix planning, epoch order, packing — is shared
    * verbatim with [[corpusToShards]] / [[corpusToBatches]] through the
    * same stage helper, so the three compositions cannot drift.
    *
    * Scale shape: [[corpusToShards]]' scaladoc applies unchanged; the
    * web front door adds only fingerprint-/host-keyed shuffles (16-byte
    * keys) and a broadcast blocklist — URLs never reach the content
    * stages, text never reaches the URL stages.
    */
  def crawlToShards(docs: DataFrame, benchmark: DataFrame,
      blocklist: DataFrame, targets: Map[String, Double],
      textCol: String = "text", idCol: String = "doc_id",
      urlCol: String = "url", domainCol: String = "source",
      shards: Int = 8, budget: Long = 2048L,
      nearDupThreshold: Double = 0.8,
      maxBucket: Int = Int.MaxValue,
      spamMaxDupFrac: Double = 0.5,
      stageDir: Option[String] = None): DataFrame = {
    val keepIds = Curation.curateWeb(docs, benchmark, blocklist, textCol,
        idCol, urlCol, spamMaxDupFrac = spamMaxDupFrac)
      .filter(col("keep")).select(col(idCol))
      .transform(Persist.round)
    shardLayout(mixFromKeep(docs, keepIds, targets, textCol, idCol,
      domainCol, nearDupThreshold, maxBucket, stageDir),
      idCol, domainCol, shards, budget)
  }

  /** [[crawlToShards]]' fine-tuning sibling (round 17): the SAME
    * web-curated / leakage-safe-split / mixed crawl corpus, laid out as
    * [[corpusToBatches]]' length-bucketed padded batches. All four
    * compositions now share their stages pairwise — curation front door
    * ([[Curation.curate]] vs [[Curation.curateWeb]]) × layout back end
    * (concat/pack vs padded batches) — through [[mixFromKeep]],
    * [[shardLayout]], and [[batchLayout]], so none can drift.
    */
  def crawlToBatches(docs: DataFrame, benchmark: DataFrame,
      blocklist: DataFrame, targets: Map[String, Double],
      textCol: String = "text", idCol: String = "doc_id",
      urlCol: String = "url", domainCol: String = "source",
      bucketWidth: Int = 64, batchSize: Int = 8, shards: Int = 4,
      nearDupThreshold: Double = 0.8,
      maxBucket: Int = Int.MaxValue,
      spamMaxDupFrac: Double = 0.5,
      stageDir: Option[String] = None): DataFrame = {
    val keepIds = Curation.curateWeb(docs, benchmark, blocklist, textCol,
        idCol, urlCol, spamMaxDupFrac = spamMaxDupFrac)
      .filter(col("keep")).select(col(idCol))
      .transform(Persist.round)
    batchLayout(mixFromKeep(docs, keepIds, targets, textCol, idCol,
      domainCol, nearDupThreshold, maxBucket, stageDir),
      idCol, domainCol, bucketWidth, batchSize, shards)
  }
}
