package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.processAllAvailable(); q.stop()
  }

  test("packStream: contract-violating late arrivals are dropped, not laid out") {
    // A doc arriving after the watermark passed its event time would
    // shift every later offset if admitted — packStream must drop it
    // (flatMapGroupsWithState does not drop late rows itself).
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamPackDoc]
    val q = Streaming.packStream(in.toDS(), budget = 10L,
        watermarkDelay = "5 minutes")
      .writeStream.format("memory").queryName("packlate")
      .outputMode("append").start()
    in.addData(StreamPackDoc(ts(0), "a", 1L, 4L),
      StreamPackDoc(ts(1), "a", 2L, 4L))
    q.processAllAvailable()
    // advance the watermark far past both docs (wm ≈ 10:55)
    in.addData(StreamPackDoc(ts(59), "a", 10L, 4L))
    q.processAllAvailable()
    // doc 3 claims an event time the watermark already passed → dropped
    in.addData(StreamPackDoc(ts(2), "a", 3L, 4L),
      StreamPackDoc(ts(59), "a", 11L, 4L))
    q.processAllAvailable()
    // flush docs 10/11 with two advancers (the watermark used by batch
    // N is batch N-1's max event time — the sessionization convention)
    in.addData(StreamPackDoc(Timestamp.valueOf("2024-01-01 12:30:00"), "zz", 0L, 1L))
    q.processAllAvailable()
    in.addData(StreamPackDoc(Timestamp.valueOf("2024-01-01 13:30:00"), "zz", 1L, 1L))
    q.processAllAvailable()
    drain(q)
    val out = spark.table("packlate").as[PackedDoc].collect()
      .filter(_.shard == "a").map(p => p.doc_id -> (p.pack_id, p.pack_offset))
      .toMap
    assert(!out.contains(3L), "late doc 3 must be dropped")
    // docs 1,2 packed contiguously (offsets 0,4), doc 10 continues at 8
    // — exactly as if doc 3 never existed
    assert(out(1L) == ((0L, 0L)) && out(2L) == ((0L, 4L)))
    assert(out(10L) == ((0L, 8L)) && out(11L) == ((1L, 2L)))
  }

  test("dedupStream: in-stream and cross-batch dups suppressed, state evicted past watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    val q = Streaming.dedupStream(in.toDF(), watermarkDelay = "10 minutes")
      .select("doc_id")
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    // batch 1: doc 2 duplicates doc 1's content IN the same batch
    in.addData(StreamDoc(ts(0), 1, "alpha beta gamma"),
      StreamDoc(ts(0), 2, "alpha beta gamma"),
      StreamDoc(ts(1), 3, "something else entirely"))
    q.processAllAvailable()
    // batch 2: doc 4 repeats doc 1's content ACROSS batches, inside the
    // watermark window (watermark after batch 1 ≈ 10:01 - 10min) → suppressed
    in.addData(StreamDoc(ts(2), 4, "alpha beta gamma"))
    q.processAllAvailable()
    assert(spark.table("dd").as[Long].collect().toSet == Set(1L, 3L),
      "first occurrence per fingerprint only")
    // advance the watermark far past doc 1's expiry (10:00 + 10min):
    // an event at 10:40 moves the watermark to ~10:30
    in.addData(StreamDoc(ts(40), 5, "watermark advancer"))
    q.processAllAvailable()
    // doc 6 repeats the content AFTER eviction → re-emitted (the
    // documented within-watermark contract: dedup is guaranteed only
    // inside the delay; cross-window exactness belongs to the batch
    // incrementalExactDedup pass)
    in.addData(StreamDoc(ts(45), 6, "alpha beta gamma"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dd").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 5L, 6L),
      s"evicted fingerprint must re-emit, got $ids")
  }

  test("chunkDedupStream: only first-seen chunks survive, per chunk not per doc") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    // chunk size 3: doc 1 = [a b c][d e f]; doc 2 reuses chunk [a b c]
    // IN-batch but brings a novel chunk; doc 3 (next batch) is wholly
    // duplicated and must contribute nothing
    val q = Streaming.chunkDedupStream(in.toDF(), chunkTokens = 3,
        watermarkDelay = "10 minutes")
      .select("doc_id")
      .writeStream.format("memory").queryName("cdd").outputMode("append")
      .start()
    in.addData(StreamDoc(ts(0), 1, "a b c d e f"),
      StreamDoc(ts(0), 2, "a b c novel chunk here"))
    q.processAllAvailable()
    in.addData(StreamDoc(ts(2), 3, "a b c d e f"))
    q.processAllAvailable()
    val perDoc = spark.table("cdd").as[Long].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    // doc 1: both chunks novel; doc 2: [a b c] suppressed, 1 survivor;
    // doc 3: nothing
    assert(perDoc == Map(1L -> 2, 2L -> 1), s"got $perDoc")
    // past eviction the same chunk re-emits (within-watermark contract)
    in.addData(StreamDoc(ts(40), 4, "watermark advancer text"))
    q.processAllAvailable()
    in.addData(StreamDoc(ts(45), 5, "a b c"))
    q.processAllAvailable()
    q.stop()
    val after = spark.table("cdd").as[Long].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(after(5L) == 1, s"evicted chunk must re-emit, got $after")
  }

  test("dedupStream exact variant: dup suppressed regardless of watermark distance") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamDoc]
    val q = Streaming.dedupStream(in.toDF(), watermarkDelay = "10 minutes",
        withinWatermark = false)
      .select("doc_id")
      .writeStream.format("memory").queryName("dde").outputMode("append").start()
    in.addData(StreamDoc(ts(0), 1, "alpha beta gamma"))
    q.processAllAvailable()
    in.addData(StreamDoc(ts(40), 2, "watermark advancer"))
    q.processAllAvailable()
    in.addData(StreamDoc(ts(45), 3, "alpha beta gamma")) // far past watermark
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dde").as[Long].collect().toSet == Set(1L, 2L),
      "exact variant holds fingerprint state forever")
  }

  test("dedupStream pluggable class (round 16): a fullwidth mirror is " +
      "suppressed under the unicode fold, passes under the default class") {
    implicit val sqlCtx = spark.sqlContext
    def fullwidth(s: String) =
      s.map(c => if (c >= 'a' && c <= 'z') (c + 0xFEE0).toChar else c)
    val uni: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      t => org.apache.spark.sql.functions.md5(
        graft.operators.Dedup.unicodeNormalize(t))
    val in = MemoryStream[StreamDoc]
    val q = Streaming.dedupStream(in.toDF(), watermarkDelay = "10 minutes",
        fingerprinter = uni)
      .select("doc_id")
      .writeStream.format("memory").queryName("ddu").outputMode("append").start()
    in.addData(StreamDoc(ts(0), 1, "alpha beta gamma"),
      StreamDoc(ts(1), 2, fullwidth("alpha beta gamma")),
      StreamDoc(ts(1), 3, "novel content here"))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("ddu").as[Long].collect().toSet == Set(1L, 3L),
      "fullwidth re-encoding must collapse onto the original's class")
    // negative control: the byte-level default treats the mirror as novel
    val in2 = MemoryStream[StreamDoc]
    val q2 = Streaming.dedupStream(in2.toDF(), watermarkDelay = "10 minutes")
      .select("doc_id")
      .writeStream.format("memory").queryName("ddv").outputMode("append").start()
    in2.addData(StreamDoc(ts(0), 1, "alpha beta gamma"),
      StreamDoc(ts(1), 2, fullwidth("alpha beta gamma")))
    q2.processAllAvailable()
    q2.stop()
    assert(spark.table("ddv").as[Long].collect().toSet == Set(1L, 2L),
      "default class must miss the re-encoding (the documented hazard)")
  }

  test("windowedCounts: watermarked tumbling windows aggregate per type") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      Event(ts(5), 1, "click", 1.0), Event(ts(10), 1, "click", 2.0),
      Event(ts(20), 2, "view", 3.0))
    val q = Streaming.windowedCounts(in.toDF(), "5 minutes", "30 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("update").start()
    drain(q)
    val rows = spark.table("wc")
      .select("event_type", "cnt", "total_value")
      .as[(String, Long, Double)].collect().toSet
    assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
  }

  test("runningUserStats: state carries across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streaming.runningUserStats(in.toDS())
      .writeStream.format("memory").queryName("rs").outputMode("update").start()
    in.addData(Event(ts(1), 7, "click", 1.0), Event(ts(2), 7, "view", 2.0))
    q.processAllAvailable()
    in.addData(Event(ts(3), 7, "purchase", 4.0))
    q.processAllAvailable()
    q.stop()
    // memory sink in update mode appends each update; the latest row for
    // user 7 carries the accumulated state
    val last = spark.table("rs").as[UserStats].collect()
      .filter(_.user_id == 7).maxBy(_.events)
    assert(last == UserStats(7, 3, 7.0, "purchase"))
  }

  test("sessionize: a late cross-batch event widens the session, never end < start") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streaming.sessionize(in.toDS(), gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("sessl").outputMode("append").start()
    in.addData(Event(ts(10), 5, "click", 1.0))
    q.processAllAvailable()
    // late event at 10:08 (before the stored end 10:10, within gap)
    in.addData(Event(ts(8), 5, "view", 2.0))
    q.processAllAvailable()
    // 10:20 closes nothing (10 min gap from end=10:10 is > 5 min... it
    // is: 10 min > 5 min, so the first session closes and must carry
    // start=10:08, end=10:10 — NOT end=10:08
    in.addData(Event(ts(20), 5, "click", 3.0))
    q.processAllAvailable()
    q.stop()
    val s = spark.table("sessl").as[UserSession].collect()
    assert(s.length == 1)
    assert(s(0) == UserSession(5, ts(8), ts(10), 2, 3.0),
      s"late event must widen, got ${s(0)}")
  }

  test("runningUserStats: a late event does not overwrite last_event_type") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streaming.runningUserStats(in.toDS())
      .writeStream.format("memory").queryName("rsl").outputMode("update").start()
    in.addData(Event(ts(10), 8, "purchase", 5.0))
    q.processAllAvailable()
    in.addData(Event(ts(2), 8, "click", 1.0)) // late by event time
    q.processAllAvailable()
    q.stop()
    val last = spark.table("rsl").as[UserStats].collect()
      .filter(_.user_id == 8).maxBy(_.events)
    assert(last == UserStats(8, 2, 6.0, "purchase"),
      s"last-by-EVENT-TIME must win, got $last")
  }

  test("sessionize: gap closes a session and emits it; open session stays") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streaming.sessionize(in.toDS(), gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    // session 1: 10:01-10:04 (3 events); then 20-min silence → session 2
    in.addData(Event(ts(1), 9, "click", 1.0), Event(ts(3), 9, "view", 2.0),
      Event(ts(4), 9, "click", 3.0))
    q.processAllAvailable()
    in.addData(Event(ts(24), 9, "click", 10.0)) // closes session 1
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess").as[UserSession].collect()
    assert(sessions.length == 1)
    assert(sessions(0) == UserSession(9, ts(1), ts(4), 3, 6.0))
  }

  test("attributeClicks: stream-stream interval join within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = Streaming.attributeClicks(clicks.toDF(), purchases.toDF(),
        watermarkDelay = "5 minutes", attributionWindow = "30 minutes")
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    // user 1: purchase at 10:05 attributes the 10:20 click (15 min gap);
    // the 10:01 click precedes the purchase → no match.
    // user 2: purchase at 10:01 is 49 min before the 10:50 click → outside
    // the 30-min window → no match.
    purchases.addData(Event(ts(5), 1, "purchase", 100.0),
      Event(ts(1), 2, "purchase", 200.0))
    clicks.addData(Event(ts(1), 1, "click", 1.0),
      Event(ts(20), 1, "click", 2.0),
      Event(ts(50), 2, "click", 3.0))
    drain(q)
    val rows = spark.table("attr")
      .select("user_id", "click_value", "purchase_value")
      .as[(Long, Double, Double)].collect().toSet
    assert(rows == Set((1L, 2.0, 100.0)))
  }

  test("attributeClicks left_outer: unmatched click flushes after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val q = Streaming.attributeClicks(clicks.toDF(), purchases.toDF(),
        watermarkDelay = "1 minutes", attributionWindow = "10 minutes",
        joinType = "left_outer")
      .writeStream.format("memory").queryName("attr_lo")
      .outputMode("append").start()
    // user 5's click at 10:02 has no purchase; user 6's click matches
    clicks.addData(Event(ts(2), 5, "click", 1.0),
      Event(ts(2), 6, "click", 2.0))
    purchases.addData(Event(ts(1), 6, "purchase", 50.0))
    q.processAllAvailable()
    // advance the watermark far past click_ts + window so the engine can
    // prove no purchase for user 5 can still arrive, flushing the outer row
    clicks.addData(Event(ts(59), 99, "click", 0.0))
    purchases.addData(Event(ts(59), 99, "purchase", 0.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("attr_lo")
      .select("user_id", "purchase_value")
      .as[(Long, Option[Double])].collect()
    assert(rows.collect { case (6L, v) => v }.flatten.toSet == Set(50.0))
    assert(rows.exists { case (u, v) => u == 5L && v.isEmpty },
      "unmatched click must flush as an outer row with null purchase")
  }

  test("enrichStream: stream-static broadcast join enriches each micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "alice"), (2L, "bob")).toDF("uid", "name")
    val in = MemoryStream[Event]
    val q = Streaming.enrichStream(in.toDF(), dim, "user_id", "uid")
      .select("user_id", "event_type", "name")
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    in.addData(Event(ts(1), 1, "click", 1.0), Event(ts(2), 3, "view", 2.0))
    drain(q)
    val rows = spark.table("enr").as[(Long, String, Option[String])]
      .collect().toSet
    assert(rows == Set((1L, "click", Some("alice")), (3L, "view", None)))
  }

  test("file sink: streaming parquet write with checkpoint survives a restart") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val in = MemoryStream[Event]
    def start() = Streaming.windowedCounts(in.toDF(), "5 minutes", "30 minutes")
      .writeStream.format("parquet")
      .option("path", s"$base/out").option("checkpointLocation", s"$base/ckpt")
      .outputMode("append").start()
    val q1 = start()
    in.addData(Event(ts(1), 1, "click", 1.0), Event(ts(2), 1, "click", 2.0))
    q1.processAllAvailable()
    // advance the watermark past the first window's end (10:30 + delay),
    // then one more batch so append mode emits the finalized window
    in.addData(Event(Timestamp.valueOf("2024-01-01 11:30:00"), 2, "view", 9.0))
    q1.processAllAvailable()
    in.addData(Event(Timestamp.valueOf("2024-01-01 11:31:00"), 2, "view", 9.0))
    q1.processAllAvailable(); q1.stop()
    val q2 = start() // restart from the checkpoint — no reprocessing
    in.addData(Event(Timestamp.valueOf("2024-01-01 12:30:00"), 2, "view", 1.0))
    q2.processAllAvailable(); q2.stop()
    val out = spark.read.parquet(s"$base/out")
    val clicks = out.filter($"event_type" === "click").collect()
    assert(clicks.length == 1 && clicks(0).getAs[Long]("cnt") == 2)
  }

  test("sessionizeEventTime: watermark timeout flushes idle keys' sessions") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streaming.sessionizeEventTime(in.toDS(), gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("sess_et").outputMode("append").start()
    // user 20's session ends at 10:03; user 21 keeps the stream moving
    in.addData(Event(ts(1), 20, "click", 1.0), Event(ts(3), 20, "view", 2.0))
    q.processAllAvailable()
    // advance event time well past 10:03 + 5min — only on ANOTHER key;
    // user 20 never produces again, so only the timeout can flush it
    in.addData(Event(ts(30), 21, "click", 7.0))
    q.processAllAvailable()
    in.addData(Event(ts(40), 21, "view", 8.0))
    q.processAllAvailable()
    q.stop()
    val flushed = spark.table("sess_et").as[UserSession].collect()
      .filter(_.user_id == 20)
    assert(flushed.toSeq == Seq(UserSession(20, ts(1), ts(3), 2, 3.0)))
  }

  test("transitionPairsStream: cross-batch chaining ≡ batch pairing; late dropped") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streaming.transitionPairsStream(in.toDS())
      .writeStream.format("memory").queryName("trans")
      .outputMode("append").start()
    in.addData(Event(ts(1), 7, "a", 1.0), Event(ts(2), 7, "b", 2.0))
    q.processAllAvailable()
    // chain continues across the batch boundary from stored state b
    in.addData(Event(ts(3), 7, "a", 3.0), Event(ts(4), 8, "x", 4.0))
    q.processAllAvailable()
    // late event behind user 7's frontier (ts 2 < stored ts 3): dropped
    in.addData(Event(ts(2), 7, "zzz", 5.0), Event(ts(5), 8, "y", 6.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("trans").as[(Long, String, String)]
      .collect().sorted.toSeq
    assert(got == Seq((7L, "a", "b"), (7L, "b", "a"), (8L, "x", "y")),
      s"got $got")
    // in-order replay matches the batch twin's non-__end__ pairs
    val batch = graft.operators.TimeSeries.transitionMatrix(
      Seq((7L, 1L, "a"), (7L, 2L, "b"), (7L, 3L, "a"),
        (8L, 4L, "x"), (8L, 5L, "y")).toDF("u", "t", "st"),
      "u", Seq(org.apache.spark.sql.functions.col("t")), "st")
      .filter(org.apache.spark.sql.functions.col("next_state")
        =!= "__end__")
      .select("state", "next_state", "n")
      .as[(String, String, Long)].collect().toSet
    val streamCounts = got.groupBy(p => (p._2, p._3))
      .map { case (k, v) => (k._1, k._2, v.size.toLong) }.toSet
    assert(streamCounts == batch, s"stream $streamCounts vs batch $batch")
  }
}
