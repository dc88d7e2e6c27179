package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  // ns timestamps at whole-second offsets for readability
  private def ns(sec: Long): Long = sec * 1000000000L

  test("rollingTimeWindow: event-time frame, irregular spacing, peers") {
    val df = Seq(
      // user 1: events at t=0, 10, 3600, 3610, 7300 (seconds)
      (1L, 1L, ns(0), 1.0), (2L, 1L, ns(10), 2.0),
      (3L, 1L, ns(3600), 4.0), (4L, 1L, ns(3610), 8.0),
      (5L, 1L, ns(7300), 16.0),
      // user 2: two events at the SAME instant — peers are both in-frame
      (6L, 2L, ns(100), 1.0), (7L, 2L, ns(100), 2.0))
      .toDF("event_id", "user_id", "ts_ns", "value")
    val out = TimeSeries.rollingTimeWindow(df, "user_id", "ts_ns", "value",
        windowNs = ns(3600))
      .select("event_id", "w_cnt", "w_sum").as[(Long, Long, Double)]
      .collect().map { case (k, c, s) => k -> ((c, s)) }.toMap
    assert(out(1L) == ((1L, 1.0)))
    assert(out(2L) == ((2L, 3.0)))
    // t=3600: frame [0, 3600] inclusive both ends → all three
    assert(out(3L) == ((3L, 7.0)))
    // t=3610: frame [10, 3610] → drops t=0
    assert(out(4L) == ((3L, 14.0)))
    // t=7300: frame [3700, 7300] → alone
    assert(out(5L) == ((1L, 16.0)))
    // RANGE peers: both same-instant rows see both rows
    assert(out(6L) == ((2L, 3.0)) && out(7L) == ((2L, 3.0)))
  }

  test("funnel: order matters, partial progress, step gating") {
    val df = Seq(
      // u1 completes in order
      (1L, 1L, ns(1), "view"), (2L, 1L, ns(2), "click"),
      (3L, 1L, ns(3), "purchase"),
      // u2: click BEFORE view — reaches view only (click never re-fires)
      (4L, 2L, ns(1), "click"), (5L, 2L, ns(2), "view"),
      // u3: view then purchase (no click) — purchase must NOT count
      (6L, 3L, ns(1), "view"), (7L, 3L, ns(2), "purchase"),
      // u4: no funnel events at all
      (8L, 4L, ns(1), "error"))
      .toDF("event_id", "user_id", "ts_ns", "event_type")
    val out = TimeSeries.funnel(df, "user_id", Seq($"ts_ns", $"event_id"),
        "event_type", Seq("view", "click", "purchase"))
      .as[(Long, Long, Long)].head()
    assert(out == ((3L, 1L, 1L)))
  }

  test("funnel: same-instant events resolve by the tiebreak order") {
    // view and click share a timestamp; event_id orders view first, so
    // the click counts (runs after the view in the total order)
    val df = Seq(
      (1L, 1L, ns(5), "view"), (2L, 1L, ns(5), "click"))
      .toDF("event_id", "user_id", "ts_ns", "event_type")
    val out = TimeSeries.funnel(df, "user_id", Seq($"ts_ns", $"event_id"),
        "event_type", Seq("view", "click")).as[(Long, Long)].head()
    assert(out == ((1L, 1L)))
  }

  test("gapFillDaily: silent days appear zero-filled, span per entity") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 11:00:00"), 2.0),
      (1L, ts("2024-01-04 09:00:00"), 4.0), // 3-day gap: Jan 2, 3 silent
      (2L, ts("2024-02-10 00:00:00"), 8.0)) // single-day span
      .toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFillDaily(df, "user_id", "ts", "value")
      .orderBy("user_id", "day").collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01", 2L, 3.0), (1L, "2024-01-02", 0L, 0.0),
      (1L, "2024-01-03", 0L, 0.0), (1L, "2024-01-04", 1L, 4.0),
      (2L, "2024-02-10", 1L, 8.0)))
  }

  test("rollingTimeWindow plan: ONE shuffle") {
    val df = Seq((1L, 1L, ns(0), 1.0))
      .toDF("event_id", "user_id", "ts_ns", "value")
    val plan = TimeSeries.rollingTimeWindow(df, "user_id", "ts_ns",
        "value", ns(3600))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected exactly one shuffle:\n$plan")
  }

  test("funnel plan: one entity shuffle feeds every stacked window") {
    // all N reached-flags share the (entity)-keyed Exchange+Sort; the
    // per-entity reduction reuses that partitioning, and only the final
    // single-row roll-up adds its own (SinglePartition) exchange — the
    // point vs the N-self-joins form, which shuffles the events N times
    val df = Seq((1L, 1L, ns(1), "view"))
      .toDF("event_id", "user_id", "ts_ns", "event_type")
    val plan = TimeSeries.funnel(df, "user_id",
        Seq(col("ts_ns"), col("event_id")), "event_type",
        Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected exactly one hash shuffle:\n$plan")
    assert(!plan.contains("Join"), s"funnel must not plan a join:\n$plan")
  }

  test("gapFillDaily: an unbounded span fails loudly, not silently") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("1970-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:00:00"), 1.0))
      .toDF("user_id", "ts", "value")
    val e = intercept[Exception] {
      TimeSeries.gapFillDaily(df, "user_id", "ts", "value",
        maxSpanDays = 30).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("gapFillDaily")))
  }
}

class CentroidOutlierSpec extends SparkSpec {
  import spark.implicits._

  test("centroidOutliers: distances to the mean vector, flag at threshold") {
    // mean = (0.4, 0.4): the +axis points sit at sqrt(0.52) ≈ 0.7211,
    // the -axis points at sqrt(2.12) ≈ 1.4560, the far point at
    // sqrt(2 · 1.6²) ≈ 2.2627 — threshold 2.0 flags only the far point
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f)), (4L, Array(0.0f, -1.0f)),
      (5L, Array(2.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val out = TimeSeriesSpecHelpers.collectOutliers(
      Similarity.centroidOutliers(df, threshold = 2.0))
    assert(out(5L)._2, "far point flags as outlier")
    assert(!out(1L)._2 && !out(2L)._2 && !out(3L)._2 && !out(4L)._2)
    assert(math.abs(out(1L)._1 - 0.7211) < 1e-4)
    assert(math.abs(out(3L)._1 - 1.4560) < 1e-4)
    assert(math.abs(out(5L)._1 - 2.2627) < 1e-4)
  }

  test("centroidOutliers: vector at the centroid has distance zero") {
    val df = Seq(
      (1L, Array(1.0f, 1.0f)), (2L, Array(-1.0f, -1.0f)),
      (3L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = TimeSeriesSpecHelpers.collectOutliers(
      Similarity.centroidOutliers(df, threshold = 0.5))
    assert(out(3L)._1 == 0.0 && !out(3L)._2)
  }
}

private object TimeSeriesSpecHelpers {
  def collectOutliers(df: org.apache.spark.sql.DataFrame)
      : Map[Long, (Double, Boolean)] =
    df.collect().map(r =>
      r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
}

class MixPlanSpec extends SparkSpec {
  import spark.implicits._

  test("domainMixPlan: shares, weights, cap, and absent-domain drop") {
    val df = Seq.tabulate(100)(i =>
      (i.toLong, if (i < 80) "web" else if (i < 90) "books" else "code", 10L))
      .toDF("id", "source", "toks")
    val out = Sampling.domainMixPlan(df, "source", col("toks"),
        targets = Map("web" -> 0.5, "books" -> 0.5), maxEpochs = 4.0)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    // web: 800/1000 observed vs 0.5 target → downsample to 0.625
    assert(out("web") == ((800L, 0.8, 0.5, 0.625)))
    // books: 100/1000 vs 0.5 → 5 epochs, capped at 4
    assert(out("books") == ((100L, 0.1, 0.5, 4.0)))
    // code: absent from targets → target 0, weight 0 (visible drop)
    assert(out("code") == ((100L, 0.1, 0.0, 0.0)))
  }

  test("domainMixPlan: target shares must sum to 1") {
    val df = Seq((1L, "a", 1L)).toDF("id", "source", "toks")
    intercept[IllegalArgumentException] {
      Sampling.domainMixPlan(df, "source", col("toks"),
        targets = Map("a" -> 0.5))
    }
  }

  // Hand-computed against the documented quantization semantic:
  // obs = .8/.1/.1 → q = round(sqrt(obs)·1e6) = 894427/316228/316228,
  // denom = 1526883 (exact integer), target = q/denom.
  test("temperatureMixPlan: α=0.5 flattens toward uniform — big domain " +
      "down, small domains up, same schema as the hand-target planner") {
    val df = Seq.tabulate(100)(i =>
      (i.toLong, if (i < 80) "web" else if (i < 90) "books" else "code", 10L))
      .toDF("id", "source", "toks")
    val out = Sampling.temperatureMixPlan(df, "source", col("toks"),
        alpha = 0.5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(out("web") == ((800L, 0.8, 0.585786, 0.732233)))
    assert(out("books") == ((100L, 0.1, 0.207107, 2.071069)))
    assert(out("code") == ((100L, 0.1, 0.207107, 2.071069)))
    // flattening invariants: every target sits between obs and uniform
    // (1/3 here), and the order of domains is preserved
    assert(out("web")._3 < 0.8 && out("web")._3 > 1.0 / 3)
    assert(out("books")._3 > 0.1 && out("books")._3 < 1.0 / 3)
  }

  test("temperatureMixPlan: α=1 reproduces the natural distribution — " +
      "every sampling weight is 1") {
    val df = Seq.tabulate(100)(i =>
      (i.toLong, if (i < 80) "web" else if (i < 90) "books" else "code", 10L))
      .toDF("id", "source", "toks")
    val out = Sampling.temperatureMixPlan(df, "source", col("toks"),
        alpha = 1.0)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    for ((dom, (obs, tgt, w)) <- out) {
      assert(tgt == obs, s"$dom: α=1 target $tgt != obs $obs")
      assert(w == 1.0, s"$dom: α=1 weight $w != 1")
    }
  }

  test("temperatureMixPlan: plan feeds materializeMix unchanged") {
    val df = Seq.tabulate(100)(i =>
      (i.toLong, if (i < 80) "web" else if (i < 90) "books" else "code", 10L))
      .toDF("id", "source", "toks")
    val plan = Sampling.temperatureMixPlan(df, "source", col("toks"), 0.5)
    val mixed = Sampling.materializeMix(df, "source", plan, "id")
    val byDom = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // weights .732/2.071/2.071 → ~58/80 web rows once, books/code twice
    // (+ an id-hash ~7% third copy); exact counts are hash-deterministic,
    // bounds are the contract here
    assert(byDom("web") >= 50 && byDom("web") <= 80)
    assert(byDom("books") >= 20 && byDom("books") <= 30)
    assert(byDom("code") >= 20 && byDom("code") <= 30)
  }

  test("temperatureMixPlan: alpha outside (0, 1] is rejected") {
    val df = Seq((1L, "a", 1L)).toDF("id", "source", "toks")
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixPlan(df, "source", col("toks"), alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixPlan(df, "source", col("toks"), alpha = 1.5)
    }
  }
}

class LatestVersionSpec extends SparkSpec {
  import spark.implicits._

  test("latestVersion: newest version per key, tiebreak on the id") {
    val df = Seq(
      (1L, "a", 10L, 1L, 1.0), (1L, "a", 20L, 2L, 2.0), // newer wins
      (1L, "b", 5L, 3L, 3.0),                           // lone version
      (2L, "a", 7L, 4L, 4.0), (2L, "a", 7L, 5L, 5.0))   // ts tie → id 5
      .toDF("user_id", "event_type", "ts_ns", "event_id", "value")
    val out = Dedup.latestVersion(df, Seq("user_id", "event_type"),
        Seq("ts_ns", "event_id"), Seq("value"))
      .as[(Long, String, Long, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, "a", 20L, 2L, 2.0), (1L, "b", 5L, 3L, 3.0),
      (2L, "a", 7L, 5L, 5.0)))
  }

  test("latestVersion plan: map-side-combined aggregate, no window") {
    val df = Seq((1L, "a", 1L, 1L, 1.0))
      .toDF("user_id", "event_type", "ts_ns", "event_id", "value")
    val plan = Dedup.latestVersion(df, Seq("user_id", "event_type"),
        Seq("ts_ns", "event_id"), Seq("value"))
      .queryExecution.executedPlan.toString
    // the point of max_by over row_number: partial_max_by combines
    // map-side, so a hot key ships ONE row per task instead of its full
    // version history. (The struct ordering key makes Spark pick
    // SortAggregate — that sort is task-local by GROUP key, bounded by
    // task input, not key hotness; the Window form's per-key sort is
    // what must not appear.)
    assert(!plan.contains("Window"), s"expected no window:\n$plan")
    assert(plan.contains("partial_max_by"),
      s"expected a map-side partial aggregate:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected exactly one shuffle:\n$plan")
  }
}

class QualityLogitSpec extends SparkSpec {
  import spark.implicits._

  test("qualityLogit: ordinary prose scores above empty/garbage text") {
    val df = Seq(
      (1L, "The quick brown fox jumps over the lazy dog and runs to " +
        "the forest in the morning light for a while."),
      (2L, ""),
      (3L, "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) @@@@"))
      .toDF("doc_id", "text")
    val out = df.select($"doc_id",
        TextAnalysis.qualityLogit($"text").as("s"))
      .as[(Long, Double)].collect().toMap
    assert(out(1L) > 0.5, s"prose scored ${out(1L)}")
    assert(out(2L) < 0.05, s"empty scored ${out(2L)}")
    assert(out(3L) < out(1L), "symbol soup scores below prose")
    out.values.foreach(s => assert(s > 0.0 && s < 1.0))
  }
}

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("scd2: no-op updates collapse, intervals chain, last row current") {
    val df = Seq(
      // user 1: A, A (no-op), B, B (no-op), A  -> three intervals
      (1L, 10L, "A", ts("2024-01-01 00:00:00")),
      (1L, 11L, "A", ts("2024-01-02 00:00:00")),
      (1L, 12L, "B", ts("2024-01-03 00:00:00")),
      (1L, 13L, "B", ts("2024-01-04 00:00:00")),
      (1L, 14L, "A", ts("2024-01-05 00:00:00")),
      // user 2: single row -> one current interval
      (2L, 20L, "X", ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_id", "tracked", "ts")
    val out = TimeSeries.scd2(df, "user_id",
        Seq(col("ts"), col("event_id")), "tracked", "ts")
      .select("user_id", "event_id", "tracked", "valid_from", "valid_to",
        "is_current")
      .as[(Long, Long, String, java.sql.Timestamp,
        Option[java.sql.Timestamp], Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 10L, "A"), (1L, 12L, "B"), (1L, 14L, "A"), (2L, 20L, "X")))
    // intervals chain: valid_to of one change = valid_from of the next
    assert(out(0)._5.contains(out(1)._4) && out(1)._5.contains(out(2)._4))
    assert(out(2)._5.isEmpty && out(2)._6, "last change is current")
    assert(out(3)._5.isEmpty && out(3)._6)
    assert(out.take(2).forall(!_._6))
  }

  test("scd2: equal-version ties break on the tiebreak column") {
    val t = ts("2024-01-01 00:00:00")
    val df = Seq(
      (1L, 2L, "B", t), (1L, 1L, "A", t), (1L, 3L, "A", ts("2024-01-02 00:00:00")))
      .toDF("user_id", "event_id", "tracked", "ts")
    val out = TimeSeries.scd2(df, "user_id",
        Seq(col("ts"), col("event_id")), "tracked", "ts")
      .select("event_id").as[Long].collect().sorted
    // order is (ts, event_id): A(1), B(2), A(3) — all three are changes
    assert(out.toSeq == Seq(1L, 2L, 3L))
  }

  test("scd2: consecutive NULL tracked values collapse; NULL-valued first row kept") {
    val df = Seq(
      // user 1 starts with NULL tracked: first row must survive (it IS
      // the initial state), the second NULL is a no-op and must collapse,
      // then NULL -> "A" and "A" -> NULL are real changes.
      (1L, 10L, None: Option[String], ts("2024-01-01 00:00:00")),
      (1L, 11L, None: Option[String], ts("2024-01-02 00:00:00")),
      (1L, 12L, Some("A"), ts("2024-01-03 00:00:00")),
      (1L, 13L, None: Option[String], ts("2024-01-04 00:00:00")),
      (1L, 14L, None: Option[String], ts("2024-01-05 00:00:00")))
      .toDF("user_id", "event_id", "tracked", "ts")
    val out = TimeSeries.scd2(df, "user_id",
        Seq(col("ts"), col("event_id")), "tracked", "ts")
      .select("event_id", "is_current")
      .as[(Long, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(10L, 12L, 13L),
      s"NULL-run collapse elected ${out.map(_._1).mkString(",")}")
    assert(out.map(_._2).toSeq == Seq(false, false, true))
  }

  test("scd2 plan: lag filter and lead share ONE shuffle") {
    val df = Seq((1L, 1L, "A", ts("2024-01-01 00:00:00")))
      .toDF("user_id", "event_id", "tracked", "ts")
    val plan = TimeSeries.scd2(df, "user_id",
        Seq(col("ts"), col("event_id")), "tracked", "ts")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"expected exactly one shuffle:\n$plan")
  }
}

class SaltedTimeWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ns(sec: Long): Long = sec * 1000000000L
  private val W = ns(3600)

  private def plainVsSalted(rows: Seq[(Long, Long, java.lang.Double)],
      chunkSize: Int): Unit = {
    val df = rows.toDF("user_id", "ts_ns", "value")
    val plain = TimeSeries.rollingTimeWindow(df, "user_id", "ts_ns",
        "value", W)
      .withColumn("w_sum", round(col("w_sum"), 4))
      .select("user_id", "ts_ns", "w_cnt", "w_sum")
      .as[(Long, Long, Long, Option[Double])].collect().sorted
    val salted = TimeSeries.saltedRollingTimeWindow(df, "user_id", "ts_ns",
        "value", W, chunkSize)
      .select("user_id", "ts_ns", "w_cnt", "w_sum")
      .as[(Long, Long, Long, Option[Double])].collect().sorted
    assert(plain.toSeq == salted.toSeq, s"chunkSize=$chunkSize diverges")
  }

  test("saltedRollingTimeWindow ≡ rollingTimeWindow across chunkings, ties and nulls") {
    // Gap cycle [0, 660s, 3000s, 4200s] between consecutive events: any
    // 3 consecutive gaps sum to >= 3660s > the 1h window, so the span
    // guard passes for every chunkSize >= 4 — while the chunk
    // BOUNDARIES still land on a tie (cs=5 first boundary, gap 0), a
    // sub-window gap (660s, 3000s), and a beyond-window gap (4200s),
    // covering every cross-boundary shape. Nulls sprinkled in; user 2
    // is a single-event entity.
    val gaps = Seq(0L, 660L, 3000L, 4200L)
    val times = gaps.indices.flatMap(_ => gaps).take(16)
      .scanLeft(0L)(_ + _) // 17 events
    val nullAt = Set(1, 6, 13)
    val rows = times.zipWithIndex.map { case (t, i) =>
      (1L, ns(t), if (nullAt(i)) null
        else java.lang.Double.valueOf((i + 1).toDouble))
    } :+ ((2L, ns(50), java.lang.Double.valueOf(5.0)))
    for (cs <- Seq(4, 5, 8, 100)) plainVsSalted(rows, cs)
  }

  test("saltedRollingTimeWindow: dense chunk (span <= window) fails loudly") {
    // 6 events 10 min apart with chunkSize 2: chunk span = 10 min < 1h
    val dense = (0 until 6).map(i => (1L, ns(600L * i),
      java.lang.Double.valueOf(i.toDouble)))
    val ex = intercept[Exception] {
      TimeSeries.saltedRollingTimeWindow(dense.toDF("user_id", "ts_ns", "value"),
        "user_id", "ts_ns", "value", W, chunkSize = 2).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t.getMessage).toSeq ++ Option(t.getCause).toSeq.flatMap(msgs)
    assert(msgs(ex).exists(_.contains("saltedRollingTimeWindow")),
      s"expected the loud span guard, got $ex")
  }

  test("saltedRollingTimeWindow at the q118 gate fixture ≡ plain q96 operator") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val ev = graft.sources.Tables.events(spark, dir)
      .select("event_id", "user_id", "ts_ns", "value")
    val plain = TimeSeries.rollingTimeWindow(ev, "user_id", "ts_ns",
        "value", W)
      .withColumn("w_sum", round(col("w_sum"), 4))
      .select("event_id", "w_cnt", "w_sum")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1)
    val salted = TimeSeries.saltedRollingTimeWindow(ev, "user_id", "ts_ns",
        "value", W, chunkSize = 16)
      .select("event_id", "w_cnt", "w_sum")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(plain.toSeq == salted.toSeq)
  }
}

/** CDC cross-operator consistency: the property a warehouse user relies
  * on implicitly — compacted states (latestVersion), state diffs
  * (snapshotDiff), and validity intervals (scd2) must tell ONE story.
  * For any cutoff t, the scd2 interval containing t must reproduce the
  * latestVersion state at t; snapshotDiff of two states must classify
  * exactly the transitions the intervals describe.
  */
class CdcCompositionSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff ∘ latestVersion ≡ scd2 interval states on the change feed") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val t1 = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    // Feed = fixture events + a planted user whose FIRST event falls in
    // (t1, t2] — exercises the 'added' classification (all fixture
    // users are active from day one).
    val base = graft.sources.Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"event_type", $"ts")
    val plantedRows = Seq(
      (9999L, 900001L, "signup", java.sql.Timestamp.valueOf("2024-01-12 08:00:00")),
      (9999L, 900002L, "click", java.sql.Timestamp.valueOf("2024-01-13 09:00:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
    val feed = base.unionByName(plantedRows).cache()
    try {
      def state(cut: java.sql.Timestamp) = Dedup.latestVersion(
        feed.filter($"ts" <= lit(cut)),
        keys = Seq("user_id"), versionCols = Seq("ts", "event_id"),
        payloadCols = Seq("event_type"))
        .select($"user_id", $"event_type")
      val diff = Snapshot.snapshotDiff(state(t1), state(t2), Seq("user_id"))
        .select($"user_id", $"old_event_type", $"new_event_type", $"status")
        .as[(Long, Option[String], Option[String], String)]
        .collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap

      val intervals = TimeSeries.scd2(feed, "user_id",
          Seq($"ts", $"event_id"), "event_type", "ts")
        .select($"user_id", $"event_type", $"valid_from", $"valid_to")
        .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp])]
        .collect()
      def stateAt(t: java.sql.Timestamp): Map[Long, String] = intervals
        .filter(iv => !iv._3.after(t) && iv._4.forall(_.after(t)))
        .map(iv => iv._1 -> iv._2).toMap
      val s1 = stateAt(t1)
      val s2 = stateAt(t2)

      // scd2 intervals reproduce the compacted states at both cutoffs
      assert(diff.filter(_._2._1.isDefined).view.mapValues(_._1.get).toMap
        == s1, "scd2 state at t1 must equal latestVersion(<=t1)")
      assert(diff.view.mapValues(_._2.get).toMap == s2,
        "scd2 state at t2 must equal latestVersion(<=t2)")

      // snapshotDiff's classification = the interval story
      diff.foreach { case (u, (old, nw, status)) =>
        val expected =
          if (old.isEmpty) "added"
          else if (old != nw) "changed" else "unchanged"
        assert(status == expected, s"user $u: $old -> $nw classified $status")
      }
      assert(!diff.values.exists(_._3 == "removed"),
        "append-only feed can never remove a key")
      // changed ⟹ an interval OPENS in (t1, t2] (the new state's
      // interval) AND the t1 interval CLOSES in (t1, t2]
      val opensInWindow = intervals.filter(iv =>
        iv._3.after(t1) && !iv._3.after(t2)).map(_._1).toSet
      diff.collect { case (u, (_, _, "changed")) => u }.foreach { u =>
        assert(opensInWindow.contains(u), s"changed user $u must open an interval")
        val ivT1 = intervals.find(iv => iv._1 == u &&
          !iv._3.after(t1) && iv._4.forall(_.after(t1))).get
        assert(ivT1._4.exists(vt => vt.after(t1) && !vt.after(t2)),
          s"changed user $u's t1 interval must close in the window")
      }
      // the fixture must actually exercise all three classes
      val statuses = diff.values.map(_._3).toSet
      assert(Set("added", "changed", "unchanged").subsetOf(statuses) ||
        statuses == Set("added", "changed"),
        s"fixture exercises $statuses")
      assert(diff(9999L)._3 == "added")
    } finally feed.unpersist()
  }
}

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff: all four statuses, null-safe payload compare") {
    val oldDf = Seq(
      (1L, Some(10), "same"),          // unchanged
      (2L, Some(20), "old"),           // changed (value)
      (3L, None: Option[Int], "gone"), // removed
      (5L, None: Option[Int], "n"))    // unchanged with NULL payload
      .toDF("k", "v", "s")
    val newDf = Seq(
      (1L, Some(10), "same"),
      (2L, Some(21), "old"),
      (4L, Some(40), "new"),           // added
      (5L, None: Option[Int], "n"))
      .toDF("k", "v", "s")
    val out = Snapshot.snapshotDiff(oldDf, newDf, Seq("k"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged"))
  }

  test("snapshotDiff: NULL-to-value payload flip is a change") {
    val oldDf = Seq((1L, None: Option[Int])).toDF("k", "v")
    val newDf = Seq((1L, Some(7))).toDF("k", "v")
    val out = Snapshot.snapshotDiff(oldDf, newDf, Seq("k"))
      .select("status").as[String].collect()
    assert(out.toSeq == Seq("changed"))
  }

  test("snapshotDiff: carries both versions of a changed payload") {
    val oldDf = Seq((1L, 10)).toDF("k", "v")
    val newDf = Seq((1L, 11)).toDF("k", "v")
    val row = Snapshot.snapshotDiff(oldDf, newDf, Seq("k"))
      .select("old_v", "new_v").as[(Int, Int)].collect().head
    assert(row == ((10, 11)))
  }

  test("snapshotDiff: mismatched payload schemas rejected") {
    intercept[IllegalArgumentException] {
      Snapshot.snapshotDiff(Seq((1L, 1)).toDF("k", "a"),
        Seq((1L, 1)).toDF("k", "b"), Seq("k"))
    }
  }
  test("holtSmooth: hand-computed level/trend, trend tracking, JVM replay equivalence") {
    // α = β = 0.5, xs = [10, 20]: l1=10 b1=0; l2 = 0.5·20+0.5·10 = 15,
    // b2 = 0.5·(15−10)+0.5·0 = 2.5, forecast2 = 17.5
    val df = Seq((1L, 1L, 10L, 10.0), (1L, 2L, 20L, 20.0))
      .toDF("user_id", "event_id", "ts_ns", "value")
    val out = graft.operators.TimeSeries.holtSmooth(df, "user_id",
        Seq("ts_ns", "event_id"), "value", alpha = 0.5, beta = 0.5)
      .select("event_id", "level", "trend", "forecast")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == ((10.0, 0.0, 10.0)))
    assert(out(2L) == ((15.0, 2.5, 17.5)))
    // on a perfect linear ramp the forecast converges to the next value
    // while a plain EWMA lags it — the reason this operator exists
    val ramp = (1L to 40L).map(i => (7L, i, i * 10L, i.toDouble * 5))
      .toDF("user_id", "event_id", "ts_ns", "value")
    val last = graft.operators.TimeSeries.holtSmooth(ramp, "user_id",
        Seq("ts_ns", "event_id"), "value", alpha = 0.5, beta = 0.5)
      .orderBy($"event_id".desc).select("forecast")
      .as[Double].head()
    val ewmaLast = graft.operators.TimeSeries.ewma(ramp, "user_id",
        Seq("ts_ns", "event_id"), "value", alpha = 0.5)
      .orderBy($"event_id".desc).select("ewma").as[Double].head()
    assert(math.abs(last - 205.0) < 0.5, s"Holt forecast $last should track the ramp's next value 205")
    assert(205.0 - ewmaLast > 4.0, s"EWMA $ewmaLast must lag the ramp — else Holt is pointless here")
    // JVM sequential replay on the events fixture (the q146 gate's
    // arithmetic), HALF_UP edge included
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"user_id", $"ts_ns", $"event_id", $"value")
    val got = graft.operators.TimeSeries.holtSmooth(ev, "user_id",
        Seq("ts_ns", "event_id"), "value", alpha = 0.2, beta = 0.1)
      .select("user_id", "event_id", "level", "trend", "forecast")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = ev.as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).iterator.flatMap { case (_, rows) =>
        var l = 0.0; var b = 0.0
        rows.sortBy(r => (r._2, r._3)).zipWithIndex.map { case (r, i) =>
          if (i == 0) { l = r._4; b = 0.0 }
          else {
            val nl = 0.2 * r._4 + (1.0 - 0.2) * (l + b)
            b = 0.1 * (nl - l) + (1.0 - 0.1) * b
            l = nl
          }
          (r._1, r._3) -> ((r4(l), r4(b), r4(l + b)))
        }
      }.toMap
    assert(got.size == expected.size && got == expected)
  }

  test("ewma: hand-computed recurrence, per-entity isolation, JVM replay equivalence") {
    val df = Seq(
      (1L, 1L, 10L, 10.0), (1L, 2L, 20L, 20.0), (1L, 3L, 30L, 0.0),
      (2L, 4L, 5L, 7.0))
      .toDF("user_id", "event_id", "ts_ns", "value")
    val out = graft.operators.TimeSeries.ewma(df, "user_id",
        Seq("ts_ns", "event_id"), "value", alpha = 0.5)
      .select("user_id", "event_id", "ewma")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // s = 10; 0.5*20+0.5*10 = 15; 0.5*0+0.5*15 = 7.5; entity 2 seeds fresh
    assert(out((1L, 1L)) == 10.0 && out((1L, 2L)) == 15.0)
    assert(out((1L, 3L)) == 7.5)
    assert(out((2L, 4L)) == 7.0)
    // JVM-side replay on the events fixture: the fold must equal a
    // sequential Scala recurrence bit-for-bit (incl. the HALF_UP edge)
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"user_id", $"ts_ns", $"event_id", $"value")
    val got = graft.operators.TimeSeries.ewma(ev, "user_id",
        Seq("ts_ns", "event_id"), "value", alpha = 0.2)
      .select("user_id", "event_id", "ewma")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val alpha = 0.2
    val expected = ev.as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).iterator.flatMap { case (_, rows) =>
        var s = Double.NaN
        rows.sortBy(r => (r._2, r._3)).zipWithIndex.map { case (r, i) =>
          s = if (i == 0) r._4 else alpha * r._4 + (1.0 - alpha) * s
          (r._1, r._3) -> BigDecimal(s)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }.toMap
    assert(got.size == expected.size && got == expected,
      s"fold diverges from the sequential replay on ${
        got.count { case (k, v) => expected(k) != v }} rows")
  }

  test("smoothers: bit-exact across partitionings, hot entity streams, null poisons") {
    // hot entity 1 (5000 rows — dwarfs the others) + small entities +
    // an entity whose value goes null mid-series: the round-15 streamed
    // fold must (a) produce IDENTICAL bits at any shuffle partitioning
    // (the q118 'across chunkings' discipline — here the partition
    // count is the only layout knob the operator has), (b) handle the
    // hot entity without materializing its history in the fold (state
    // is O(1) by construction; this pins the output), (c) propagate a
    // null value into a null state for every later row of that entity,
    // exactly like the recursive-CTE oracle's NULL arithmetic.
    val rows =
      (1L to 5000L).map(i => (1L, i, i * 7L, Some((i % 97).toDouble))) ++
      (1L to 5L).map(i => (2L, 1000L + i, i * 11L, Some(i * 2.0))) ++
      Seq((3L, 2001L, 10L, Some(4.0)), (3L, 2002L, 20L, None),
        (3L, 2003L, 30L, Some(6.0)))
    val df = rows.toDF("user_id", "event_id", "ts_ns", "value")
    def run(parts: String) = {
      val old = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val e = graft.operators.TimeSeries.ewma(df, "user_id",
            Seq("ts_ns", "event_id"), "value", alpha = 0.2)
          .select("user_id", "event_id", "ewma")
          .as[(Long, Long, Option[Double])].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
        val h = graft.operators.TimeSeries.holtSmooth(df, "user_id",
            Seq("ts_ns", "event_id"), "value", alpha = 0.2, beta = 0.1)
          .select("user_id", "event_id", "level", "trend")
          .as[(Long, Long, Option[Double], Option[Double])].collect()
          .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
        (e, h)
      } finally spark.conf.set("spark.sql.shuffle.partitions", old)
    }
    val (e1, h1) = run("1")
    val (e7, h7) = run("7")
    val (e32, h32) = run("32")
    assert(e1 == e7 && e7 == e32, "ewma bits differ across partitionings")
    assert(h1 == h7 && h7 == h32, "holt bits differ across partitionings")
    // null poisoning: the null row and every later row of entity 3 are
    // null; entities before/after are untouched
    assert(e32((3L, 2001L)).contains(4.0))
    assert(e32((3L, 2002L)).isEmpty && e32((3L, 2003L)).isEmpty)
    assert(h32((3L, 2002L)) == ((None, None)))
    assert(h32((3L, 2003L)) == ((None, None)))
    // hot entity spot check: the fold ran the full 5000-row recurrence
    // (seed 1.0, deterministic) — compare against a local replay
    var s = 1.0
    (2L to 5000L).foreach(i => s = 0.2 * (i % 97).toDouble + 0.8 * s)
    assert(e32((1L, 5000L)).contains(BigDecimal(s)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }
}

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("mergeDaily(state, delta) equals the full recompute") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 2.0),
      (1L, ts("2024-01-01 11:00:00"), -3.0),
      (1L, ts("2024-01-02 10:00:00"), 5.0),
      (2L, ts("2024-01-01 09:00:00"), 1.5),
      (2L, ts("2024-01-03 09:00:00"), 4.5))
      .toDF("user_id", "ts", "value")
    // split mid-day 1: the (1, day1) key exists on BOTH sides of the
    // merge; (1, day2) only in state; (2, day3) only in the delta
    val stored = IncrementalAgg.dailyState(
      events.filter($"ts" <= "2024-01-01 10:30:00"), "user_id", "ts", "value")
    val delta = IncrementalAgg.dailyState(
      events.filter($"ts" > "2024-01-01 10:30:00"), "user_id", "ts", "value")
    val merged = IncrementalAgg.mergeDaily(stored, delta, "user_id")
    val full = IncrementalAgg.dailyState(events, "user_id", "ts", "value")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
    val d1 = merged.filter($"user_id" === 1 && $"day" === "2024-01-01")
      .as[(Long, java.sql.Date, Long, Double, Double, Double)].collect().head
    assert(d1._3 == 2L && d1._4 == -1.0 && d1._5 == -3.0 && d1._6 == 2.0)
  }

  test("mergeDaily rejects mismatched state schemas") {
    val good = Seq((1L, java.sql.Date.valueOf("2024-01-01"), 1L, 1.0, 1.0, 1.0))
      .toDF("user_id", "day", "cnt", "sum_v", "min_v", "max_v")
    intercept[IllegalArgumentException] {
      IncrementalAgg.mergeDaily(good, good.drop("max_v"), "user_id")
    }
  }

  test("seasonalAnomaly: spike flagged, echo flagged, warmup NULL, guards") {
    // flat series with one spike at index 10; season 2, trailing 4,
    // minObs 2, k=3: residuals are 0 everywhere except +90 at the
    // spike and -90 two slots later (the seasonal-naive echo — a known
    // artifact of the model, deliberately visible)
    val rows = (1L to 12L).map(i =>
      ("a", i, if (i == 10L) 100.0 else 10.0)).toDF("e", "idx", "v")
    val got = TimeSeries.seasonalAnomaly(rows, "e", Seq(col("idx")), "v",
        season = 2, window = 4, minObs = 2, k = 3)
      .select(col("idx"), col("is_anomaly"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    // rows 1-2 have no season-2 history at all → dropped entirely
    assert(got.keySet == (3L to 12L).toSet, s"wrong rows: $got")
    assert(got(3L).isEmpty && got(4L).isEmpty, "warmup rows must be NULL")
    assert((5L to 9L).forall(got(_).contains(false)))
    assert(got(10L).contains(true), "the spike itself")
    assert(got(11L).contains(false))
    assert(got(12L).contains(true), "the season-lag echo of the spike")
    intercept[IllegalArgumentException] {
      TimeSeries.seasonalAnomaly(rows, "e", Seq(col("idx")), "v", 0, 4, 2, 3)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.seasonalAnomaly(rows, "e", Seq(col("idx")), "v", 2, 1, 2, 3)
    }
  }

  test("retentionCohorts: day cohorts, dup collapse, month boundary") {
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    // u1: days 1, 2, 4 (two events on day 1 — must collapse);
    // u2: day 1 only; u3: days 2, 3
    val df = Seq(
      (1L, t("2024-03-01 08:00:00")), (1L, t("2024-03-01 17:00:00")),
      (1L, t("2024-03-02 09:00:00")), (1L, t("2024-03-04 09:00:00")),
      (2L, t("2024-03-01 10:00:00")),
      (3L, t("2024-03-02 10:00:00")), (3L, t("2024-03-03 10:00:00")))
      .toDF("user_id", "ts")
    val got = TimeSeries.retentionCohorts(df, "user_id", "ts")
      .select("cohort", "offset", "n_active", "cohort_size", "retention")
      .as[(java.sql.Date, Long, Long, Long, Double)].collect()
      .map { case (c, o, n, sz, r) => (c.toString, o) -> ((n, sz, r)) }
      .toMap
    assert(got == Map(
      ("2024-03-01", 0L) -> ((2L, 2L, 1.0)),
      ("2024-03-01", 1L) -> ((1L, 2L, 0.5)),
      ("2024-03-01", 3L) -> ((1L, 2L, 0.5)),
      ("2024-03-02", 0L) -> ((1L, 1L, 1.0)),
      ("2024-03-02", 1L) -> ((1L, 1L, 1.0))), s"$got")
    // month buckets cross a year boundary: Dec 2023 -> Feb 2024 = 2
    val m = Seq((1L, t("2023-12-15 00:00:00")),
      (1L, t("2024-02-03 00:00:00"))).toDF("user_id", "ts")
    val mo = TimeSeries.retentionCohorts(m, "user_id", "ts", "month")
      .select("offset").as[Long].collect().sorted
    assert(mo.toSeq == Seq(0L, 2L), s"$mo")
    intercept[IllegalArgumentException] {
      TimeSeries.retentionCohorts(df, "user_id", "ts", "hour")
    }
  }

  test("cusum: closed form ≡ sequential recursion; flags; null; guards") {
    // level shift: 10 ×10 then 20 ×10, plus one null (excluded from n
    // and the accumulation)
    val rows = ((1 to 10).map(i => ("a", i.toLong, Some(10.0))) ++
      Seq(("a", 11L, Option.empty[Double])) ++
      (12 to 21).map(i => ("a", i.toLong, Some(20.0))))
      .toDF("e", "idx", "v")
    val got = TimeSeries.cusum(rows, "e", Seq(col("idx")), "v",
        slack = 2.0, h = 10.0, scale = 1L)
      .select("idx", "value_q", "s_pos", "s_neg", "threshold_q",
        "is_shift", "n")
      .as[(Long, Long, Long, Long, Long, Boolean, Long)].collect()
      .sortBy(_._1)
    assert(got.length == 20 && got.forall(_._7 == 20L),
      "null row excluded from output and from n")
    // replay the textbook recursion on the same quantized integers:
    // d_i = q_i*n - sum, s+_i = max(0, s+_{i-1} + d_i - slack*n)
    val qs = got.map(_._2)
    val n = 20L; val s = qs.sum; val slackN = 2L * n
    var sp = 0L; var sn = 0L
    got.zip(qs).foreach { case ((idx, _, gp, gn, th, flag, _), q) =>
      val d = q * n - s
      sp = math.max(0L, sp + d - slackN)
      sn = math.max(0L, sn - d - slackN)
      assert(gp == sp && gn == sn, s"row $idx: ($gp,$gn) vs ($sp,$sn)")
      assert(th == 10L * n)
      assert(flag == (sp > th || sn > th), s"row $idx flag")
    }
    // both sides actually fired on this fixture
    assert(got.exists(r => r._3 > r._5) && got.exists(r => r._4 > r._5),
      "fixture must exercise both CUSUM sides")
    intercept[IllegalArgumentException] {
      TimeSeries.cusum(rows, "e", Seq(col("idx")), "v", -1.0, 10.0)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.cusum(rows, "e", Seq(col("idx")), "v", 2.0, 0.0)
    }
    // magnitude guard (ADVICE r17): |value_q|·n² past the long headroom
    // raises instead of silently wrapping — 100 rows of 5e10 at scale
    // 1e4 gives max|q| = 5e14 > (Long.MaxValue/4)/1e4 ≈ 2.3e14
    val big = (1 to 100).map(i => ("a", i.toLong, Some(5.0e10)))
      .toDF("e", "idx", "v")
    intercept[Exception] {
      TimeSeries.cusum(big, "e", Seq(col("idx")), "v",
        slack = 2.0, h = 10.0, scale = 10000L).collect()
    }
    // the same magnitude at a lower quantization scale fits and runs
    assert(TimeSeries.cusum(big, "e", Seq(col("idx")), "v",
      slack = 2.0, h = 10.0, scale = 1L).count() == 100L)
  }

  test("transitionMatrix: hand-computed chain, __end__ completion, null splice") {
    import spark.implicits._
    // u1: a b a b END; u2: a a END; null state in u1 splices b->a
    // across it; null entity row drops entirely
    val rows = Seq(
      (Option("u1"), 1L, Option("a")), (Option("u1"), 2L, Option("b")),
      (Option("u1"), 3L, Option.empty[String]),
      (Option("u1"), 4L, Option("a")), (Option("u1"), 5L, Option("b")),
      (Option("u2"), 1L, Option("a")), (Option("u2"), 2L, Option("a")),
      (Option.empty[String], 1L, Option("x")))
      .toDF("u", "t", "st")
    val got = TimeSeries.transitionMatrix(rows, "u", Seq(col("t")), "st")
      .select("state", "next_state", "n", "n_from", "p")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got == Map(
      ("a", "b") -> ((2L, 4L, 0.5)),
      ("a", "a") -> ((1L, 4L, 0.25)),
      ("a", "__end__") -> ((1L, 4L, 0.25)),
      ("b", "a") -> ((1L, 2L, 0.5)),
      ("b", "__end__") -> ((1L, 2L, 0.5))), s"got $got")
    // per-source probabilities sum to exactly 1
    val sums = got.toSeq.groupBy(_._1._1)
      .map { case (s, rs) => s -> rs.map(_._2._3).sum }
    assert(sums.values.forall(_ == 1.0), s"sums $sums")
  }
}
