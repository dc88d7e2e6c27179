package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{Dedup, Sampling, TextAnalysis, Windows}

/** Batch↔streaming equivalence gates: each MemoryStream twin is drained
  * over the SAME fixture as its gated batch operator and asserted equal
  * — the strongest cheap oracle available for the unbounded paths. A
  * semantics drift between a batch operator and its streaming twin is a
  * failure here, not a silent divergence in production.
  *
  * Determinism notes baked into the fixtures:
  *  - the 500 base documents have 500 distinct content fingerprints
  *    (verified in the dedup test), so feeding base docs and planted
  *    copies in SEPARATE micro-batches makes every stream winner
  *    deterministic (state beats batch; no in-batch fp conflicts);
  *  - session boundaries depend only on per-user timestamp GAPS, never
  *    on tie order, so the batch/stream comparison is stable even where
  *    two events share a millisecond.
  */
class BatchStreamEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def fixtureExists(name: String): Boolean =
    new java.io.File(s"$dir/$name.parquet").exists()

  test("sessionization: drained streaming twin ≡ batch twin on the events fixture") {
    assume(fixtureExists("events"))
    val gapMs = 30L * 60 * 1000
    // Both engines on the SAME ms-resolution key the streaming twin
    // observes (Timestamp.getTime): the batch side sessionizes on
    // unix_millis and rolls session_idx up to (start, end, events,
    // total) frames.
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_type", $"value")
    val ms = ev.withColumn("__ms", unix_millis($"ts"))
    val batchFrames = Windows.sessionize(ms, "user_id", Seq(col("__ms")),
        "__ms", gapMs)
      .groupBy($"user_id", $"session_idx")
      .agg(min($"__ms").as("s"), max($"__ms").as("e"),
        count(lit(1)).as("n"), sum($"value").as("total"))
      .select($"user_id", $"s", $"e", $"n", $"total")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3) -> (r._4, r._5)).toMap

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streaming.sessionizeEventTime(in.toDS(), gapMs,
        watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("eqsess").outputMode("append")
      .start()
    val fixture = ev.as[Event].collect().toSeq
    in.addData(fixture)
    q.processAllAvailable()
    // Two advancer batches on a sentinel user: the watermark used by
    // batch N is batch N-1's max event time, so the second advancer is
    // what flushes sessions ending near the fixture's max ts.
    val maxTs = fixture.map(_.ts.getTime).max
    in.addData(Event(new Timestamp(maxTs + 3600L * 1000), -1L, "x", 0.0))
    q.processAllAvailable()
    in.addData(Event(new Timestamp(maxTs + 7200L * 1000), -1L, "x", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("eqsess").as[UserSession].collect()
      .filter(_.user_id >= 0)
      .map(s => (s.user_id, s.start.getTime, s.end.getTime) ->
        (s.events, s.total_value)).toMap

    assert(streamed.keySet == batchFrames.keySet,
      s"session intervals diverge: stream-only=${streamed.keySet -- batchFrames.keySet}, " +
        s"batch-only=${batchFrames.keySet -- streamed.keySet}")
    assert(streamed.nonEmpty && streamed.size > 20, "fixture must sessionize")
    streamed.foreach { case (k, (n, total)) =>
      assert(batchFrames(k)._1 == n, s"session $k event count")
      assert(math.abs(batchFrames(k)._2 - total) < 1e-6,
        s"session $k total ${batchFrames(k)._2} vs $total")
    }
  }

  test("ingest fingerprint dedup: drained streaming twin ≡ batch twin (q74 fixture shape)") {
    assume(fixtureExists("documents"))
    val base = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text")
    // Determinism precondition for the stream winners (see class doc).
    assert(base.select(TextAnalysis.fingerprint($"text")).distinct().count()
      == base.count(), "base fixture must have distinct fingerprints")
    val planted = base.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + 100000).as("doc_id"), $"text")
    val all = base.unionByName(planted)
    // Batch twin: q74's operator; kept = rows that are their own
    // canonical (min doc_id per fingerprint — always the base copy).
    val emptyCorpus = base.filter(lit(false))
      .select(TextAnalysis.fingerprint($"text").as("fp"))
    val batchKept = Dedup.incrementalExactDedup(all, emptyCorpus,
        "text", "doc_id")
      .filter(!$"is_dup").select($"doc_id").as[Long].collect().toSet

    for (withinWatermark <- Seq(false, true)) {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[StreamDoc]
      val name = s"eqdedup$withinWatermark"
      val q = Streaming.dedupStream(in.toDF(), watermarkDelay = "1 hour",
          withinWatermark = withinWatermark)
        .select("doc_id")
        .writeStream.format("memory").queryName(name).outputMode("append")
        .start()
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
      in.addData(base.as[(Long, String)].collect().toSeq
        .map { case (id, tx) => StreamDoc(new Timestamp(t0), id, tx) })
      q.processAllAvailable()
      // copies arrive a minute later — well inside the watermark delay,
      // so BOTH disciplines must suppress them
      in.addData(planted.as[(Long, String)].collect().toSeq
        .map { case (id, tx) => StreamDoc(new Timestamp(t0 + 60000L), id, tx) })
      q.processAllAvailable()
      q.stop()
      val streamKept = spark.table(name).as[Long].collect()
      assert(streamKept.length == streamKept.toSet.size,
        s"withinWatermark=$withinWatermark: one survivor per fingerprint")
      assert(streamKept.toSet == batchKept,
        s"withinWatermark=$withinWatermark: kept sets diverge")
    }
  }

  test("URL dedup: drained streaming twin ≡ batch urlDedup (q156 fixture " +
      "shape); null urls never collapse") {
    // organic unique URLs, then cosmetic variants arriving a minute later
    val base = (1L to 40L).map(i =>
      (i, s"https://h${i % 7}.example.com/docs/$i?a=1&b=2"))
    val twins = base.filter(_._1 % 4 == 0).map { case (i, u) =>
      (i + 1000, u.replace("https://", "HTTPS://")
        .replace("?a=1&b=2", "?b=2&a=1&utm_s=x") + "#f")
    }
    val all = (base ++ twins).toDF("doc_id", "url")
    val batchKept = graft.operators.Urls.urlDedup(all)
      .filter(!$"is_dup").select($"doc_id").as[Long].collect().toSet
    assert(batchKept == base.map(_._1).toSet, "batch: originals win")

    for (withinWatermark <- Seq(false, true)) {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(Timestamp, Long, String)]
      val name = s"equrldedup$withinWatermark"
      val q = Streaming.urlDedupStream(
          in.toDF().toDF("ts", "doc_id", "url"),
          watermarkDelay = "1 hour", withinWatermark = withinWatermark)
        .select("doc_id")
        .writeStream.format("memory").queryName(name).outputMode("append")
        .start()
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
      in.addData(base.map { case (i, u) => (new Timestamp(t0), i, u) })
      q.processAllAvailable()
      in.addData(twins.map { case (i, u) =>
        (new Timestamp(t0 + 60000L), i, u) })
      q.processAllAvailable()
      // null-URL rows are their OWN canonical: all three must survive
      in.addData(Seq((new Timestamp(t0 + 120000L), 2001L, null: String),
        (new Timestamp(t0 + 120000L), 2002L, null: String),
        (new Timestamp(t0 + 120000L), 2003L, null: String)))
      q.processAllAvailable()
      q.stop()
      val streamKept = spark.table(name).as[Long].collect().toSet
      assert(streamKept == batchKept ++ Set(2001L, 2002L, 2003L),
        s"withinWatermark=$withinWatermark: kept sets diverge")
    }
  }

  test("host blocklist: stateless streaming twin ≡ batch operator, messy " +
      "entries normalized on both sides") {
    val docs = Seq(
      (1L, "https://spam.example.com/x"), (2L, "https://a.b.example.com/x"),
      (3L, "https://notexample.com/x"), (4L, "https://example.com.evil.io/x"),
      (5L, "no-scheme"), (6L, "https://sub.dotted.org/y"))
      .toDF("doc_id", "url")
    val entries = Seq("  Example.COM  ", "dotted.org.")
    val batch = graft.operators.Urls.hostBlocklistFilter(docs,
        entries.toDF("domain"))
      .as[(Long, Option[String], Boolean)].collect().sortBy(_._1).toSeq
    assert(batch.map(r => r._1 -> r._3) == Seq(1L -> true, 2L -> true,
      3L -> false, 4L -> false, 5L -> false, 6L -> true))

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Streaming.hostBlocklistFilterStream(
        in.toDF().toDF("doc_id", "url"), entries)
      .writeStream.format("memory").queryName("eqblocklist")
      .outputMode("append").start()
    in.addData(docs.as[(Long, String)].collect().toSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("eqblocklist")
      .as[(Long, Option[String], Boolean)].collect().sortBy(_._1).toSeq
    assert(streamed == batch, "stream twin must equal the batch screen")
  }

  test("chunk dedup: drained streaming twin ≡ batch twin (q86 fixture shape)") {
    assume(fixtureExists("documents"))
    val chunkTokens = 20
    val base = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text")
    val planted = base
      .withColumn("__t", filter(split($"text", "\\s+"), t => t =!= ""))
      .filter($"doc_id" % 12 === 0 && size($"__t") >= 40)
      .select(($"doc_id" + 600000).as("doc_id"),
        concat(array_join(slice($"__t", 1, 40), " "),
          lit(" planted unique chunk tail marker "),
          $"doc_id".cast("string")).as("text"))
    val all = base.unionByName(planted).cache()
    try {
      val nPlanted = planted.count()
      assert(nPlanted > 0, "fixture must yield planted partial copies")
      // Batch twin surface: per-doc chunk stats + the corpus' distinct
      // chunk fingerprints via the SAME token_chunks kernel.
      val stats = Dedup.duplicatedChunkStats(all, "text", "doc_id",
          chunkTokens)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val chunks = all.select($"doc_id",
        explode(graft.functions.ShingleFunctions
          .tokenChunks($"text", chunkTokens)).as("c"))
        .select($"doc_id", md5($"c").as("fp"))
      val totalChunks = chunks.count()
      val distinctFps = chunks.select($"fp").distinct()
        .as[String].collect().toSet

      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[StreamDoc]
      val q = Streaming.chunkDedupStream(in.toDF(),
          chunkTokens = chunkTokens, watermarkDelay = "1 hour")
        .select("doc_id", "chunk_fp")
        .writeStream.format("memory").queryName("eqchunk")
        .outputMode("append").start()
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
      in.addData(base.as[(Long, String)].collect().toSeq
        .map { case (id, tx) => StreamDoc(new Timestamp(t0), id, tx) })
      q.processAllAvailable()
      in.addData(planted.as[(Long, String)].collect().toSeq
        .map { case (id, tx) => StreamDoc(new Timestamp(t0 + 60000L), id, tx) })
      q.processAllAvailable()
      q.stop()
      val survivors = spark.table("eqchunk")
        .select($"doc_id", $"chunk_fp").as[(Long, String)].collect()

      // Every distinct corpus chunk survives exactly once; suppressed
      // mass is exactly the duplicate mass.
      assert(survivors.map(_._2).toSet == distinctFps &&
        survivors.length == distinctFps.size,
        "surviving chunk set must be the distinct corpus chunk set")
      assert(totalChunks - survivors.length ==
        totalChunks - distinctFps.size)
      // Per-doc consistency with the batch stats: a stream-suppressed
      // chunk is necessarily corpus-duplicated.
      val survPerDoc = survivors.groupBy(_._1).view.mapValues(_.length)
      stats.foreach { case (id, (nChunks, nDup)) =>
        val suppressed = nChunks - survPerDoc.getOrElse(id, 0)
        assert(suppressed >= 0 && suppressed <= nDup,
          s"doc $id: suppressed $suppressed vs n_dup $nDup")
      }
      // Planted docs: both 40-token-prefix chunks were seen in the base
      // batch; the tail marker chunk is unique → exactly 1 survivor.
      planted.select($"doc_id").as[Long].collect().foreach { id =>
        assert(survPerDoc.getOrElse(id, 0) == 1 &&
          stats(id)._1 - 1 == 2, s"planted doc $id")
      }
    } finally all.unpersist()
  }

  test("CDC compaction: drained streaming twin ≡ batch latestVersion, shuffled feed") {
    assume(fixtureExists("events"))
    // Batch twin on the same (ts, value) version order the stream uses —
    // the value tie-break makes both sides fixture-convention-free.
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_type", $"value")
    // latestVersion's output column order: keys ++ carried =
    // (user_id, event_type, ts, value)
    val batch = Dedup.latestVersion(ev,
        keys = Seq("user_id", "event_type"),
        versionCols = Seq("ts", "value"), payloadCols = Seq.empty)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getTimestamp(2), r.getDouble(3))).toMap
    val counts = ev.groupBy($"user_id", $"event_type").count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streaming.latestVersionStream(in.toDS())
      .writeStream.format("memory").queryName("eqcdc").outputMode("update")
      .start()
    // Shuffled three-way micro-batch split: arrival order must not
    // matter (late/out-of-order changes converge to the same state).
    val rnd = new scala.util.Random(13)
    val fixture = rnd.shuffle(ev.as[Event].collect().toSeq)
    fixture.grouped((fixture.size + 2) / 3).foreach { chunk =>
      in.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    // Final state per key = the row with the max (monotone) n_changes.
    val streamed = spark.table("eqcdc").as[LatestVersion].collect()
      .groupBy(s => (s.user_id, s.event_type)).view
      .mapValues(_.maxBy(_.n_changes)).toMap

    assert(streamed.keySet == batch.keySet,
      s"key sets diverge: stream-only=${(streamed.keySet -- batch.keySet).take(5)}, " +
        s"batch-only=${(batch.keySet -- streamed.keySet).take(5)}")
    assert(streamed.size > 50, "fixture must have a real key population")
    streamed.foreach { case (k, s) =>
      val (bts, bval) = batch(k)
      assert(s.ts == bts && s.value == bval,
        s"key $k: stream (${s.ts}, ${s.value}) vs batch ($bts, $bval)")
      assert(s.n_changes == counts(k),
        s"key $k: n_changes ${s.n_changes} vs feed count ${counts(k)}")
    }
  }

  test("sequence packing: drained streaming twin ≡ batch packSequences, arrival-order shuffled") {
    assume(fixtureExists("documents"))
    val budget = 2048L
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        TextAnalysis.tokenCount($"text").cast("long").as("n_tokens"))
    val batch = Sampling.packSequences(docs, "n_tokens", budget,
        Seq("lang"), "doc_id")
      .select($"lang", $"doc_id", $"n_tokens", $"pack_id", $"pack_offset")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    assert(batch.values.map(_._2).max >= 3,
      "fixture must spread over multiple packs per shard")

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamPackDoc]
    val q = Streaming.packStream(in.toDS(), budget,
        watermarkDelay = "1 hour")
      .writeStream.format("memory").queryName("eqpack")
      .outputMode("append").start()
    // ts monotone in doc_id (the StreamPackDoc contract; the fixture
    // span — 500 ms — sits far inside the 1 h watermark delay), but
    // ARRIVAL order fully shuffled across three micro-batches.
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val fixture = docs.as[(Long, String, Long)].collect().toSeq
      .map { case (id, lang, n) =>
        StreamPackDoc(new Timestamp(t0 + id), lang, id, n) }
    val rnd = new scala.util.Random(29)
    val shuffled = rnd.shuffle(fixture)
    shuffled.grouped((shuffled.size + 2) / 3).foreach { chunk =>
      in.addData(chunk)
      q.processAllAvailable()
    }
    // nothing may release while the watermark sits below the fixture
    // (the shuffle window is covered by the delay)
    assert(spark.table("eqpack").count() == 0,
      "no document may be laid out before the watermark certifies order")
    // two advancer batches on a sentinel shard flush the buffer (the
    // watermark used by batch N is batch N-1's max event time)
    val maxTs = fixture.map(_.ts.getTime).max
    in.addData(StreamPackDoc(new Timestamp(maxTs + 7200L * 1000), "zz", 0L, 1L))
    q.processAllAvailable()
    in.addData(StreamPackDoc(new Timestamp(maxTs + 14400L * 1000), "zz", 1L, 1L))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("eqpack").as[PackedDoc].collect()
      .filter(_.shard != "zz")
      .map(p => (p.shard, p.doc_id) -> (p.n_tokens, p.pack_id, p.pack_offset))
      .toMap
    assert(streamed.keySet == batch.keySet,
      s"doc sets diverge: stream-only=${(streamed.keySet -- batch.keySet).take(5)}, " +
        s"batch-only=${(batch.keySet -- streamed.keySet).take(5)}")
    streamed.foreach { case (k, v) =>
      assert(batch(k) == v, s"doc $k: stream $v vs batch ${batch(k)}") }
  }

  test("sequence packing: emission is INCREMENTAL as the watermark advances, final ≡ batch") {
    assume(fixtureExists("documents"))
    val budget = 2048L
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"lang",
        TextAnalysis.tokenCount($"text").cast("long").as("n_tokens"))
    val batch = Sampling.packSequences(docs, "n_tokens", budget,
        Seq("lang"), "doc_id")
      .select($"lang", $"doc_id", $"pack_id", $"pack_offset")
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamPackDoc]
    val q = Streaming.packStream(in.toDS(), budget,
        watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("eqpackinc")
      .outputMode("append").start()
    // event times a minute apart: the stream spans hours, so mid-stream
    // watermarks release earlier documents while later ones still flow —
    // the twin must not be a trivial end-of-stream flush
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val fixture = docs.as[(Long, String, Long)].collect().toSeq
      .sortBy(_._1)
      .map { case (id, lang, n) =>
        StreamPackDoc(new Timestamp(t0 + id * 60000L), lang, id, n) }
    var midStreamEmitted = 0L
    fixture.grouped((fixture.size + 2) / 3).foreach { chunk =>
      in.addData(chunk)
      q.processAllAvailable()
      midStreamEmitted = spark.table("eqpackinc").count()
    }
    assert(midStreamEmitted > 0 && midStreamEmitted < fixture.size,
      s"expected partial mid-stream emission, got $midStreamEmitted of " +
        s"${fixture.size}")
    val maxTs = fixture.map(_.ts.getTime).max
    in.addData(StreamPackDoc(new Timestamp(maxTs + 3600L * 1000), "zz", 0L, 1L))
    q.processAllAvailable()
    in.addData(StreamPackDoc(new Timestamp(maxTs + 7200L * 1000), "zz", 1L, 1L))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("eqpackinc").as[PackedDoc].collect()
      .filter(_.shard != "zz")
      .map(p => (p.shard, p.doc_id) -> (p.pack_id, p.pack_offset)).toMap
    assert(streamed == batch,
      s"incremental layout diverges: stream-only=" +
        s"${(streamed.toSet -- batch.toSet).take(5)}, batch-only=" +
        s"${(batch.toSet -- streamed.toSet).take(5)}")
  }

  test("semantic decontamination: stateless streaming twin ≡ batch operator (q142 fixture shape)") {
    assume(fixtureExists("embeddings"))
    // planted zero-norm vector: both twins must emit the defined audit
    // row (null bench, null sim, not contaminated), not NaN/crash
    val dim = graft.sources.Tables.embeddings(spark, dir)
      .select(size($"embedding")).as[Int].head()
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select($"vec_id", $"embedding")
      .unionByName(Seq((999999L, Seq.fill(dim)(0.0f)))
        .toDF("vec_id", "embedding"))
    val benchDf = emb.filter($"vec_id" % 50 === 0 && $"vec_id" < 999999L)
      .select($"vec_id".as("bench_id"),
        transform($"embedding", x => x + lit(0.01f)).as("embedding"))
    val batch = graft.operators.Decontaminate
      .semanticDecontaminate(emb, benchDf, threshold = 0.9)
      .as[(Long, Option[Long], Option[Double], Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(batch.values.count(_._3) >= 2, "planted sources must flag")
    assert(batch(999999L) == ((None, None, false)),
      s"zero-norm batch row: ${batch(999999L)}")

    // the closure-captured eval set: the same +0.01f float arithmetic,
    // collected — metadata-sized by the operator's contract
    val bench = benchDf.as[(Long, Seq[Float])].collect()
      .map { case (i, v) => (i, v.toArray) }.toSeq
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val q = Streaming.semanticDecontaminateStream(
        in.toDF().toDF("vec_id", "embedding"), bench, threshold = 0.9)
      .writeStream.format("memory").queryName("eqsemdecon")
      .outputMode("append").start()
    val fixture = emb.as[(Long, Seq[Float])].collect().toSeq
    fixture.grouped((fixture.size + 2) / 3).foreach { chunk =>
      in.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("eqsemdecon").as[ContaminationFlag].collect()
      .map(f => f.vec_id -> ((f.bench_id, f.max_sim, f.contaminated))).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (k, v) =>
      assert(batch(k) == v, s"doc $k: stream $v vs batch ${batch(k)}") }
  }

  test("fuzzy decontamination: stateless streaming twin ≡ batch operator (q155 fixture shape)") {
    assume(fixtureExists("documents"))
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text")
    // q155's fixture: every 25th doc re-surfaces in the benchmark with
    // one appended token (J = (T-2)/(T-1) against its original)
    val benchDf = docs.filter($"doc_id" % 25 === 0)
      .select($"doc_id".as("bench_id"),
        concat($"text", lit(" zq7f")).as("text"))
    val batch = graft.operators.Decontaminate
      .fuzzyDecontaminate(docs, benchDf)
      .as[(Long, Option[Long], Option[Double], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(batch.values.count(_._3) >= 10, "planted twins must flag")

    val bench = benchDf.as[(Long, String)].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Streaming.fuzzyDecontaminateStream(
        in.toDF().toDF("doc_id", "text"), bench)
      .writeStream.format("memory").queryName("eqfuzzydecon")
      .outputMode("append").start()
    val fixture = docs.as[(Long, String)].collect().toSeq
    fixture.grouped((fixture.size + 2) / 3).foreach { chunk =>
      in.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("eqfuzzydecon").as[FuzzyFlag].collect()
      .map(f => f.doc_id -> ((f.bench_id, f.jaccard, f.contaminated))).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (k, v) =>
      assert(batch(k) == v, s"doc $k: stream $v vs batch ${batch(k)}") }
  }

  test("exact decontamination: stateless streaming twin ≡ batch operator (q80 fixture shape)") {
    assume(fixtureExists("documents"))
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text")
    val benchDf = docs.filter($"doc_id" % 25 === 0 && length($"text") >= 300)
      .select(substring($"text", 41, 200).as("text"))
    val batch = graft.operators.Decontaminate
      .flagContaminated(docs, benchDf, n = 8)
      .as[(Long, Boolean)].collect().toMap
    assert(batch.values.count(identity) >= 5, "planted sources must flag")

    val bench = benchDf.as[String].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Streaming.exactDecontaminateStream(
        in.toDF().toDF("doc_id", "text"), bench, n = 8)
      .writeStream.format("memory").queryName("eqexactdecon")
      .outputMode("append").start()
    val fixture = docs.as[(Long, String)].collect().toSeq
    fixture.grouped((fixture.size + 2) / 3).foreach { chunk =>
      in.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("eqexactdecon").as[ExactFlag].collect()
      .map(f => f.doc_id -> f.contaminated).toMap
    assert(streamed == batch)
  }

  test("span decontamination: stateless streaming twin ≡ batch operator (q158 fixture shape)") {
    assume(fixtureExists("documents"))
    val docs = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", $"text")
    val benchDf = docs.filter($"doc_id" % 22 === 0 && length($"text") >= 300)
      .select($"doc_id".as("bench_id"),
        concat(lit("zq "), substring($"text", 31, 220)).as("text"))
    val batch = graft.operators.Decontaminate
      .spanDecontaminate(docs, benchDf)
      .as[(Long, Long, Int, Int, Int)].collect().toSet
    assert(batch.nonEmpty, "planted excerpts must produce spans")

    val bench = benchDf.as[(Long, String)].collect().toSeq
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Streaming.spanDecontaminateStream(
        in.toDF().toDF("doc_id", "text"), bench)
      .writeStream.format("memory").queryName("eqspandecon")
      .outputMode("append").start()
    val fixture = docs.as[(Long, String)].collect().toSeq
    fixture.grouped((fixture.size + 2) / 3).foreach { chunk =>
      in.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("eqspandecon").as[SpanRow].collect()
      .map(s => (s.doc_id, s.bench_id, s.doc_start, s.bench_start,
        s.span_chars)).toSet
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; " +
        s"batch-only: ${(batch -- streamed).take(3)}")
  }

  test("value histogram: the SAME operator run as a complete-mode stream ≡ batch (q112 shape)") {
    assume(fixtureExists("events"))
    // Sketches.histogram is declarative enough to run unchanged on an
    // unbounded frame — this gate proves the ONE definition agrees
    // across both runners (state = bin cardinality, metadata-sized; a
    // histogram monitor needs no watermark). Counts are exact longs, so
    // equality is exact.
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"ts", $"user_id", $"event_type", $"value")
    val batch = graft.operators.Sketches.histogram(ev, "value", 0.5)
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1))) -> r.getLong(2)).toMap

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = graft.operators.Sketches.histogram(in.toDF(), "value", 0.5)
      .writeStream.format("memory").queryName("eqhist")
      .outputMode("complete").start()
    // two micro-batches: the final table must merge state across them
    val fixture = ev.as[Event].collect().toSeq
    fixture.grouped((fixture.size + 1) / 2).foreach { chunk =>
      in.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("eqhist").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1))) -> r.getLong(2)).toMap
    assert(streamed == batch,
      s"histogram diverges: stream-only=${(streamed.toSet -- batch.toSet).take(3)}, " +
        s"batch-only=${(batch.toSet -- streamed.toSet).take(3)}")
    assert(batch.size > 10, "fixture must spread over multiple bins")
  }

  test("HLL register sketch: the SAME operator run as a complete-mode stream ≡ batch") {
    assume(fixtureExists("events"))
    // hllRegisters is a pure groupBy-max — it runs unchanged on an
    // unbounded frame (state = sketch cardinality ≤ groups × 2^p,
    // metadata-sized, no watermark needed). Registers are exact ints,
    // so the drained table must equal batch register for register —
    // and because max-merge across micro-batches IS hllMerge's
    // arithmetic, this doubles as the incremental-ingest gate.
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"ts", $"user_id", $"event_type", $"value")
    val batch = graft.operators.Sketches
      .hllRegisters(ev, Seq("event_type"), $"user_id", p = 10)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = graft.operators.Sketches
      .hllRegisters(in.toDF(), Seq("event_type"), $"user_id", p = 10)
      .writeStream.format("memory").queryName("eqhll")
      .outputMode("complete").start()
    // two micro-batches: the final table must max-merge state across them
    val fixture = ev.as[Event].collect().toSeq
    fixture.grouped((fixture.size + 1) / 2).foreach { chunk =>
      in.addData(chunk)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = spark.table("eqhll").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(streamed == batch,
      s"HLL diverges: stream-only=${(streamed.toSet -- batch.toSet).take(3)}, " +
        s"batch-only=${(batch.toSet -- streamed.toSet).take(3)}")
    assert(batch.size > 50, "fixture must spread over many registers")
  }

  test("KMV and CMS sketches: the SAME operators run as complete-mode streams ≡ batch") {
    assume(fixtureExists("events"))
    // Both sketch aggregates are custom TypedImperativeAggregates —
    // this gate proves the bounded buffers merge correctly through the
    // streaming state store across micro-batches, value-identical to
    // one batch pass (state = sketch cardinality, metadata-sized).
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"ts", $"user_id", $"event_type", $"value")
    val kmvBatch = graft.operators.Sketches
      .kmvSketch(ev, Seq("event_type"), $"user_id", k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val cmsBatch = graft.operators.Sketches
      .cmsSketch(ev, Seq("event_type"), $"user_id", depth = 2, width = 32)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
      .toMap

    implicit val sqlCtx = spark.sqlContext
    val fixture = ev.as[Event].collect().toSeq
    def drain(name: String)(
        q: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : Array[org.apache.spark.sql.Row] = {
      val in = MemoryStream[Event]
      val sq = q(in.toDF()).writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      fixture.grouped((fixture.size + 1) / 2).foreach { chunk =>
        in.addData(chunk)
        sq.processAllAvailable()
      }
      sq.stop()
      spark.table(name).collect()
    }
    val kmvStream = drain("eqkmv")(df => graft.operators.Sketches
        .kmvSketch(df, Seq("event_type"), $"user_id", k = 64))
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kmvStream == kmvBatch,
      s"KMV diverges: stream-only=${(kmvStream -- kmvBatch).take(3)}")
    val cmsStream = drain("eqcms")(df => graft.operators.Sketches
        .cmsSketch(df, Seq("event_type"), $"user_id", depth = 2, width = 32))
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(cmsStream == cmsBatch,
      s"CMS diverges: ${(cmsStream.toSet -- cmsBatch.toSet).take(3)}")
  }

  test("HDR quantile sketch: the SAME operator run as a complete-mode stream ≡ batch") {
    assume(fixtureExists("events"))
    // hdrSketch is a pure (group, bucket) count — counts add across
    // micro-batches exactly as hdrMerge adds sketches, so the drained
    // complete-mode table must equal one batch pass bucket for bucket
    // (and therefore every quantile read off it).
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"ts", $"user_id", $"event_type", $"value")
    val batch = graft.operators.Sketches
      .hdrSketch(ev, Seq("event_type"), "value")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    implicit val sqlCtx = spark.sqlContext
    val fixture = ev.as[Event].collect().toSeq
    val in = MemoryStream[Event]
    val sq = graft.operators.Sketches
      .hdrSketch(in.toDF(), Seq("event_type"), "value")
      .writeStream.format("memory").queryName("eqhdr")
      .outputMode("complete").start()
    fixture.grouped((fixture.size + 1) / 2).foreach { chunk =>
      in.addData(chunk)
      sq.processAllAvailable()
    }
    sq.stop()
    val streamed = spark.table("eqhdr").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch,
      s"HDR diverges: ${(streamed.toSet -- batch.toSet).take(3)}")
  }

  test("incremental linkage: stream rule-1 ≡ batch from_stored flags; rules 2-3 stay batch") {
    val stored = Seq(
      (1L, "ada lovelace", "london", 10.0, 1L),
      (2L, "ada lovelaze", "london", 10.0, 1L),
      (3L, "grace hopper", "london", 5.0, 3L)
    ).toDF("id", "name", "city", "bal", "entity_id")
    val fresh = Seq(
      LinkRec(10L, "ada lovelacq", "london", 10.0), // rule 1 → entity 1
      LinkRec(11L, "alan turing", "london", 7.0),   // stranger → null
      LinkRec(12L, "grace hoppex", "london", 5.0),  // rule 1 → entity 3
      LinkRec(13L, "grace hoppxx", "london", 5.0),  // rule 2 (via 12) —
      // the stream MUST leave it null: clustering is batch compaction
      LinkRec(14L, "mary shellex", "london", 3.0),  // rule 3 — null
      LinkRec(15L, "mary shelley", "london", 3.0)   // rule 3 — null
    )
    val index = Streaming.buildLinkageIndex(stored, "entity_id",
      Seq("city"), "name", "bal")
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[LinkRec]
    val q = Streaming.incrementalResolveStream(in.toDF(), index, "id",
        Seq("city"), "name", "bal", maxEdits = 1)
      .writeStream.format("memory").queryName("eqlink")
      .outputMode("append").start()
    in.addData(fresh)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("eqlink").collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))),
          r.getBoolean(2))).toMap
    assert(got == Map(
      10L -> ((Some(1L), true)), 11L -> ((None, false)),
      12L -> ((Some(3L), true)), 13L -> ((None, false)),
      14L -> ((None, false)), 15L -> ((None, false))), s"stream: $got")
    // cross-check against the batch twin: every record the STREAM
    // resolves must carry the same entity in the batch result, and the
    // stream must never resolve a record the batch didn't
    val batch = graft.operators.Linkage.incrementalResolve(stored,
        fresh.toDF("id", "name", "city", "bal"), "id", "entity_id",
        Seq("city"),
        levenshtein(col("a.name"), col("b.name")) <= 1 &&
          col("a.bal") === col("b.bal"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap
    got.foreach { case (id, (eOpt, _)) =>
      eOpt.foreach { e =>
        assert(batch(id) == ((e, true)),
          s"stream resolved $id to $e but batch says ${batch(id)}")
      }
    }
  }

  test("html extraction: stateless streaming twin ≡ batch operator " +
      "(q222 fixture shape)") {
    assume(fixtureExists("documents"))
    // realistic page per doc: nav + paragraphs (split keeping the
    // token) + script + link-dense footer — the q226 fixture shape
    val pages = graft.sources.Tables.documents(spark, dir)
      .select($"doc_id", concat(
        lit("<html><body><div class=\"nav\"><a href=\"/\">Home</a> " +
          "<a href=\"/a\">About</a></div><p>"),
        regexp_replace($"text", " table ", " table</p><p> "),
        lit("</p><script>x()</script><footer>" +
          "<a href=\"/t\">Terms</a></footer></body></html>")).as("html"))
    val batch = graft.operators.Html
      .extractHtmlText(pages, "doc_id", "html")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(batch.nonEmpty && batch.exists(_._3 > 2),
      "fixture must yield multi-block documents")

    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = graft.operators.Html.extractHtmlTextStream(
        in.toDF().toDF("doc_id", "html"), "doc_id", "html")
      .writeStream.format("memory").queryName("eqhtml")
      .outputMode("append").start()
    in.addData(pages.as[(Long, String)].collect().toSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("eqhtml")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(streamed == batch,
      "row-local streaming extraction must equal the batch operator")
  }
}

/** Fixture row for the incremental-linkage equivalence gate. */
case class LinkRec(id: Long, name: String, city: String, bal: Double)
