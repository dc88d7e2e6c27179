package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-stage invariants of the composed corpus→shards pipeline — the
  * things no single-stage gate can see (the full value oracle is q147;
  * this spec checks the STRUCTURE the composition promises).
  */
class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  // gopher/quality-green doc bodies: 120 tokens, 50% stopwords, doc-
  // specific filler so no accidental cross-doc shingle overlap
  private def body(tag: String): String =
    (1 to 60).map(i => s"the w${tag}x$i").mkString(" ")

  private val leaky = (1 to 60).map(i => s"the item$i").mkString(" ")

  private lazy val docs = {
    val a = (1 to 12).map(i => (i.toLong, "a", body(s"a$i")))
    val b = (21 to 26).map(i => (i.toLong, "b", body(s"b$i")))
    val dup = Seq((101L, "a", body("a1")))          // exact dup of id 1
    val cont = Seq((31L, "b", leaky))               // contaminated
    val near = Seq((41L, "b", body("nd")),          // near-dup pair:
      (42L, "b", body("nd") + " zzqq"))             // one appended token
    (a ++ b ++ dup ++ cont ++ near).toDF("doc_id", "source", "text")
  }

  private lazy val out = TrainingPipeline.corpusToShards(
    docs, Seq(leaky.take(200)).toDF("text"),
    targets = Map("a" -> 0.7, "b" -> 0.3), shards = 4, budget = 50L)
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
      r.getInt(4), r.getLong(5), r.getLong(6), r.getLong(7)))

  test("curation rejects never reach the layout; dups/contamination gone") {
    val ids = out.map(_._1).toSet
    assert(!ids.contains(101L), "exact-dup copy must be curated out")
    assert(!ids.contains(31L), "contaminated doc must be curated out")
    // the canonical (id 1) survives curation — if absent from the layout
    // it can only be a val/test split draw, so its dup twin being gone
    // while other a-domain docs remain is the meaningful check above
  }

  test("near-dup cluster members never straddle the split boundary") {
    val ids = out.map(_._1).toSet
    assert(ids.contains(41L) == ids.contains(42L),
      s"cluster (41,42) straddles the split: present=${
        ids.filter(Set(41L, 42L))}")
  }

  test("each doc's epoch copies are contiguous from 1") {
    out.groupBy(_._1).foreach { case (id, rows) =>
      val epochs = rows.map(_._3).sorted.toSeq
      assert(epochs == (1 to epochs.size), s"doc $id epochs: $epochs")
    }
  }

  test("per-shard pos is a 0-based rank; pack coords replay the running sum") {
    out.groupBy(_._4).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_._5)
      assert(sorted.map(_._5).toSeq == (0 until rows.size),
        s"shard $shard pos not contiguous")
      var run = 0L
      sorted.foreach { case (id, _, ep, _, _, nTok, packId, packOff) =>
        assert(packId == run / 50 && packOff == run % 50,
          s"doc $id epoch $ep in shard $shard: expected pack " +
            s"(${run / 50},${run % 50}), got ($packId,$packOff)")
        run += nTok
      }
    }
  }

  test("hot-bucket cap threads through the composition (VERDICT r15 #2): " +
      "planted boilerplate floods band buckets past the cap, yet the capped " +
      "layout is identical to the uncapped one (full recall)") {
    // 86-token template (43 distinct tmplN words interleaved with 'the' —
    // curation-green, no repeated trigram) + 13 per-doc-unique suffix
    // tokens: cluster members sit at Jaccard 84/110 ≈ 0.76, under the
    // 0.8 verify threshold, while ~86% of each doc's shingles are
    // template-shared — the hot-bucket profile with zero true pairs.
    val template = (1 to 43).flatMap(i => Seq("the", s"tmpl$i")).mkString(" ")
    val stems = Seq("sector", "docket", "ledger", "marker", "packet",
      "roster", "binder", "folio", "module", "tablet", "beacon", "cipher",
      "anchor")
    val cluster = (0 until 60).map(i =>
      (500L + i, "a", template + " " + stems.map(w => s"$w$i").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val all = docs.unionByName(cluster)
    // (a) the flood is real: replicate the operator's banding (k=32, b=8,
    // r=4) through the public shingle/signature kernels and check the
    // largest band bucket exceeds the cap — otherwise this gate would
    // pass without ever exercising the anti-join path
    val sh = cluster.select(col("doc_id"),
        Dedup.wordShingles(col("text")).as("sh"))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), 32))
    val hottest = sh.select(col("doc_id"), posexplode(
        transform(sequence(lit(0), lit(7)),
          j => concat_ws(",", transform(slice(col("sig"), j * 4 + 1, lit(4)),
            h => h.cast("string"))))).as(Seq("band", "key")))
      .groupBy(col("band"), col("key")).count()
      .agg(max(col("count"))).as[Long].collect()(0)
    assert(hottest > 20,
      s"fixture defect: hottest band bucket $hottest <= cap 20 — the " +
        "capped path would not fire")
    // (b) full recall: capped and uncapped compositions agree exactly,
    // and the planted cluster reached the layout (survived curation)
    def run(cap: Int) = TrainingPipeline.corpusToShards(
      all, Seq(leaky.take(200)).toDF("text"),
      targets = Map("a" -> 0.7, "b" -> 0.3), shards = 4, budget = 50L,
      maxBucket = cap).collect().toSet
    val capped = run(20)
    assert(capped == run(Int.MaxValue),
      "capped composition diverged from uncapped — the cap lost a pair")
    assert(capped.exists(_.getLong(0) >= 500L),
      "planted boilerplate never reached the layout — it was curated " +
        "out, so the gate checked nothing")
  }

  test("stageDir materializes the curated corpus (the 100 TB path) and " +
      "changes nothing about the layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stage").toString
    val staged = TrainingPipeline.corpusToShards(
      docs, Seq(leaky.take(200)).toDF("text"),
      targets = Map("a" -> 0.7, "b" -> 0.3), shards = 4, budget = 50L,
      stageDir = Some(s"$dir/curated")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(staged == out.toSet,
      "staged composition diverged from the lazy one")
    // the curated corpus really was written: narrow schema, curated rows
    val curated = spark.read.parquet(s"$dir/curated")
    assert(curated.columns.sorted.toSeq == Seq("doc_id", "source", "text"))
    val ids = curated.select($"doc_id").as[Long].collect().toSet
    assert(!ids.contains(101L) && !ids.contains(31L),
      "rejects leaked into the staged curated corpus")
    assert(ids.contains(1L), "canonical doc missing from the staged corpus")
  }

  test("corpusToBatches shares the curated mix with corpusToShards and " +
      "keeps the q148 batch contract (VERDICT r15 #3)") {
    val batches = TrainingPipeline.corpusToBatches(
      docs, Seq(leaky.take(200)).toDF("text"),
      targets = Map("a" -> 0.7, "b" -> 0.3),
      bucketWidth = 16, batchSize = 4, shards = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getInt(5), r.getInt(6), r.getInt(7), r.getLong(8),
        r.getLong(9)))
    // the two layouts are views of ONE curated/split/mixed corpus: same
    // (doc, epoch) multiset, same token counts
    assert(batches.map(t => (t._1, t._3)).sorted.toSeq ==
      out.map(t => (t._1, t._3)).sorted.toSeq,
      "batch layout covers a different (doc, epoch) set than the pack layout")
    val tokByDoc = out.map(t => t._1 -> t._6).toMap
    batches.foreach { case (id, _, _, nTok, _, _, _, _, _, _) =>
      assert(nTok == tokByDoc(id), s"doc $id n_tokens $nTok") }
    // q148 contract: bucket arithmetic, cell-local contiguous positions,
    // batch-max padding, bounded waste
    batches.foreach { case (id, _, ep, nTok, bucket, _, _, _, paddedTo, waste) =>
      assert(bucket == (nTok + 15) / 16, s"doc $id bucket")
      assert(paddedTo >= nTok && waste == paddedTo - nTok, s"doc $id pad")
      assert(waste < 16, s"doc $id epoch $ep pad_waste $waste >= bucketWidth")
    }
    batches.groupBy(t => (t._5, t._6, t._7)).foreach { case (cell, rows) =>
      assert(rows.map(_._8).sorted.toSeq == (0 until rows.size),
        s"batch $cell pos_in_batch not contiguous")
      assert(rows.size <= 4, s"batch $cell oversize")
      assert(rows.map(_._9).distinct.size == 1 &&
        rows.head._9 == rows.map(_._4).max,
        s"batch $cell padded_to is not the batch max")
    }
  }

  test("token counts in the layout match the curated docs' token counts") {
    val expected = docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    out.foreach { case (id, _, _, _, _, nTok, _, _) =>
      assert(nTok == expected(id), s"doc $id n_tokens $nTok")
    }
  }

  test("crawlToShards: URL screens gate the layout; clean docs share the " +
      "corpusToShards stages verbatim (round 17)") {
    // crawl frame: every doc gets a unique clean URL; planted rejects —
    // a blocked-host page, a URL-dup twin of id 1, and a 3-page spam
    // mill (2/3 dup_frac) — must never reach the layout
    val clean = docs.withColumn("url",
      concat(lit("https://ok"), col("doc_id"), lit(".net/p/"),
        col("doc_id")))
    val planted = Seq(
      (201L, "a", body("blk"), "https://evil.com/x"),
      (202L, "a", body("a1x"), "https://ok1.net/p/1#twin"),
      (203L, "a", body("m1"), "https://mill.io/s"),
      (204L, "a", body("m1"), "https://mill.io/s?utm_q=1"),
      (205L, "a", body("m1"), "https://mill.io/s#f"))
      .toDF("doc_id", "source", "text", "url")
    val crawl = clean.unionByName(planted)
    val web = TrainingPipeline.crawlToShards(crawl,
      Seq(leaky.take(200)).toDF("text"), Seq("evil.com").toDF("domain"),
      targets = Map("a" -> 0.7, "b" -> 0.3), shards = 4, budget = 50L)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    val ids = web.map(_._1).toSet
    assert(Seq(201L, 202L, 203L, 204L, 205L).forall(!ids.contains(_)),
      s"URL-screened docs leaked into the layout: ${
        ids.filter(_ >= 201L)}")
    // with every planted row URL-rejected and all organic URLs unique,
    // the layout must equal corpusToShards' over the same organic docs
    assert(web.sortBy(r => (r._1, r._3)).toSeq ==
      out.sortBy(r => (r._1, r._3)).toSeq,
      "crawlToShards must share the split/mix/order/pack stages exactly")
    // ...and the fourth composition corner: crawlToBatches over the same
    // crawl frame equals corpusToBatches over the clean corpus
    val webBatches = TrainingPipeline.crawlToBatches(crawl,
      Seq(leaky.take(200)).toDF("text"), Seq("evil.com").toDF("domain"),
      targets = Map("a" -> 0.7, "b" -> 0.3))
      .collect().map(_.toSeq).sortBy(_.toString)
    val batches = TrainingPipeline.corpusToBatches(docs,
      Seq(leaky.take(200)).toDF("text"),
      targets = Map("a" -> 0.7, "b" -> 0.3))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(webBatches.toSeq == batches.toSeq,
      "crawlToBatches must share the curated mix + batch stages exactly")
  }
}
