package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics over an event stream (`events(event_id, ts,
  * user_id, event_type, value)`): time-based rolling windows, funnel
  * progression, and calendar gap-filling. The reference's Gold layer is
  * calendar-bucketed time series (Weather_API.py:559-666 monthly/yearly
  * groupings); these are the event-time generalizations a production
  * analytics engine adds on top.
  *
  * All three are single-logical-shuffle designs:
  *  - [[rollingTimeWindow]] / [[funnel]] shuffle once on the entity key and
  *    reuse that sort for every stacked window expression;
  *  - [[gapFillDaily]] aggregates on (entity, day) and derives the spine
  *    from the same aggregate, so the raw table is scanned once.
  *
  * Skew: a hot entity (bot user) serializes its own rows through one task,
  * exactly like [[Windows.rollingAvg]] — [[saltedRollingTimeWindow]] is
  * the RANGE-form escape hatch (chunk boundaries carry a time-window tail
  * instead of a row-count tail).
  */
object TimeSeries {

  /** Time-based rolling aggregate: for every row, `count` and `sum(value)`
    * over the entity's rows in `(t - windowNs, t]`... inclusive lower
    * bound per SQL RANGE semantics: `[t - windowNs, t]`. The order key is
    * a monotone epoch-long column (nanoseconds in this harness — see
    * [[graft.sources.Tables.events]]'s `ts_ns` convention), so the frame
    * is an integer RANGE and both engines agree on peer handling (rows
    * with equal timestamps are all in-frame).
    *
    * Unlike the row-count frame ([[Windows.rollingAvg]]) this is the
    * event-time form: "activity in the last hour", robust to irregular
    * event spacing. One shuffle + one sort; both aggregates share the
    * frame buffer.
    */
  def rollingTimeWindow(df: DataFrame, entity: String, orderNs: String,
      value: String, windowNs: Long): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(col(orderNs))
      .rangeBetween(-windowNs, 0)
    df.withColumn("w_cnt", count(lit(1)).over(w))
      .withColumn("w_sum", round(sum(col(value)).over(w), 4))
  }

  /** Skew-hardened [[rollingTimeWindow]], equivalent output for any
    * chunking (gated against q96's oracle as q118): the event-time
    * translation of [[Windows.saltedRollingAvg]]'s chunk remedy.
    *
    * Phase 1: per-entity row number → fixed-size chunks; rows then
    * shuffle by (entity, chunk), so the max task is the chunk size, not
    * the entity size. Phase 2: each chunk computes the RANGE frame
    * locally (the frame clamps at the chunk edge). Phase 3: rows whose
    * frame crosses the chunk start — `orderNs < chunk_min + windowNs` —
    * add the missing mass via a bounded join against the PREVIOUS
    * chunk's time-window tail (its rows within `windowNs` of its max —
    * the "last window of rows", bounded by event rate, not by entity
    * size).
    *
    * One-chunk lookback contract: every non-final chunk must SPAN more
    * than `windowNs` of event time, else a boundary frame could reach
    * two chunks back — the operator fails LOUDLY (raise_error, the
    * [[gapFillDaily]] pattern) telling the caller to raise `chunkSize`.
    * A chunk spanning less than the window also means per-row frames
    * hold more than `chunkSize` rows — at that density the frames
    * themselves are the cost, and no exact per-row plan bounds it; the
    * remedy is a bigger chunk (or pre-bucketed aggregation), chosen
    * deliberately, not a silent wrong answer.
    *
    * Tie safety: a RANGE frame includes PEERS of the current timestamp —
    * which row_number chunking can place in the NEXT chunk. Each tie
    * group is therefore pulled back into its first row's chunk (a
    * `min(chunk)` over the RANGE(0,0) peer frame — same sort, same
    * Exchange), so frames only ever reach BACKWARD across boundaries and
    * the one-chunk-lookback argument holds. A tie group larger than
    * `chunkSize` (which could swallow a whole chunk and break the
    * lookback) fails loudly — at that multiplicity the peer frames
    * exceed the chunk anyway, same reasoning as the span guard.
    */
  def saltedRollingTimeWindow(df: DataFrame, entity: String, orderNs: String,
      value: String, windowNs: Long, chunkSize: Int = 10000): DataFrame = {
    require(chunkSize >= 2, s"chunkSize must be >= 2, got $chunkSize")
    val wEnt = Window.partitionBy(col(entity)).orderBy(col(orderNs))
    val wEntAll = Window.partitionBy(col(entity))
    val wPeers = wEnt.rangeBetween(0, 0)
    val numbered = df
      .withColumn("__rn", row_number().over(wEnt))
      .withColumn("__chunk0", ((col("__rn") - 1) / chunkSize).cast("long"))
      .withColumn("__chunk",
        when(count(lit(1)).over(wPeers) <= chunkSize,
          min(col("__chunk0")).over(wPeers))
          .otherwise(raise_error(concat(
            lit(s"saltedRollingTimeWindow: more than chunkSize=$chunkSize " +
              "rows share one timestamp for entity "),
            col(entity).cast("string")))))
      .withColumn("__maxChunk", max(col("__chunk")).over(wEntAll))
      .drop("__chunk0")
    val wChunk = Window.partitionBy(col(entity), col("__chunk"))
    val wRange = wChunk.orderBy(col(orderNs)).rangeBetween(-windowNs, 0)
    val local = numbered
      .withColumn("__cmin", min(col(orderNs)).over(wChunk))
      .withColumn("__cmax", max(col(orderNs)).over(wChunk))
      .withColumn("__localCnt", count(lit(1)).over(wRange))
      .withColumn("__localSum", sum(col(value)).over(wRange))
      .withColumn("__guard",
        when(col("__chunk") === col("__maxChunk") ||
          col("__cmax") - col("__cmin") > windowNs, lit(1))
          .otherwise(raise_error(concat(
            lit(s"saltedRollingTimeWindow: a non-final chunk spans <= " +
              s"windowNs=$windowNs for entity "),
            col(entity).cast("string"),
            lit(" — raise chunkSize for exact one-chunk lookback")))))
    val tails = local
      .filter(col("__guard") === 1 &&
        col(orderNs) >= col("__cmax") - windowNs)
      .select(col(entity).as("__t_e"), (col("__chunk") + 1).as("__t_chunk"),
        col(orderNs).as("__t_ts"), col(value).as("__t_v"))
    val keyCols = df.columns.toSeq ++
      Seq("__rn", "__localCnt", "__localSum")
    val boundary = local
      .filter(col("__chunk") > 0 && col(orderNs) < col("__cmin") + windowNs)
      .join(tails,
        col(entity) === col("__t_e") && col("__chunk") === col("__t_chunk")
          && col("__t_ts") >= col(orderNs) - windowNs, "left")
      .groupBy(keyCols.map(col): _*)
      .agg(count(col("__t_ts")).as("__tailCnt"),
        sum(col("__t_v")).as("__tailSum"))
      .withColumn("w_cnt", col("__localCnt") + col("__tailCnt"))
      .withColumn("w_sum",
        when(col("__localSum").isNull && col("__tailSum").isNull,
          lit(null).cast("double"))
          .otherwise(round(coalesce(col("__localSum"), lit(0.0)) +
            coalesce(col("__tailSum"), lit(0.0)), 4)))
    val interior = local
      .filter(!(col("__chunk") > 0 && col(orderNs) < col("__cmin") + windowNs))
      .withColumn("w_cnt", col("__localCnt"))
      .withColumn("w_sum", round(col("__localSum"), 4))
    val outCols = df.columns.map(col) :+ col("w_cnt") :+ col("w_sum")
    interior.select(outCols: _*).unionByName(boundary.select(outCols: _*))
  }

  /** Ordered funnel: how many entities reached step 1, step 1→2, …
    * (each step must occur at-or-after the previous one, per entity).
    *
    * Implementation is the single-pass stacked-window form, not the
    * N-self-joins textbook form: a running "reached step k" flag per row
    * (`max` over an unbounded-preceding frame), where step k counts only
    * at rows whose type matches AND whose running step-(k-1) flag is
    * already set. All N window expressions share ONE (entity)-keyed
    * shuffle + sort — the N-join form would shuffle the event table N
    * times and explode on hot entities. The per-entity reduction that
    * follows reuses the same hash partitioning (no extra Exchange), and
    * the final global roll-up is a single-row partial aggregate.
    *
    * `order` must be a deterministic total order (pass a tiebreak column
    * alongside the timestamp) so simultaneous events resolve identically
    * across engines and retries.
    */
  /** Shared driver for the recursive smoothers ([[ewma]]/[[holtSmooth]]):
    * hash-partition by entity, EXTERNAL-sort within partitions by
    * (entity, order…), then stream the rows through a sequential JVM
    * fold that keeps only the current entity's recurrence state.
    *
    * Why this shape (round 15, replaces collect_list + an
    * `aggregate(..., concat(acc, …))` fold): the old form held an
    * entity's ENTIRE series in one aggregation buffer (the r14 verdict's
    * one remaining 100×-scale exposure — a hot entity OOMs the task) and
    * the array accumulator re-copied itself per step — O(n²) time and
    * allocation per entity (ADVICE r14). A chunk-and-carry rewrite à la
    * [[saltedRollingTimeWindow]] was considered and rejected: a
    * recurrence is inherently sequential, so chunking buys NO
    * parallelism for the outputs — bit-exact entry states require
    * folding through every prior element anyway (affine-map composition
    * changes the op order and therefore the ulps) — it only caps task
    * memory. Streaming the fold over Spark's external sorter caps
    * memory harder (state is O(1) per entity — one double for EWMA, two
    * for Holt; the sorter spills unbounded history to disk) at the same
    * single-shuffle cost, with the recurrence arithmetic IDENTICAL
    * step for step.
    *
    * Determinism contract unchanged: `order` must be a total order per
    * entity (pass a tiebreak column); the fold runs in that order in
    * double — the exact arithmetic an oracle's recursive CTE replays,
    * so outputs stay bit-identical across engines AND across
    * partitionings/chunk sizes (asserted in TimeSeriesSpec). A null
    * value poisons the entity's state from that row on (α·null = null),
    * exactly as the Catalyst fold and the SQL recursion do.
    *
    * `stateCols` emit per-row outputs from (state, just-seeded?); the
    * state type S carries the recurrence; null state ⇒ all-null outputs.
    */
  private def foldSmoother[S](df: DataFrame, entity: String,
      order: Seq[String], valueCol: String, outCols: Seq[String],
      seed: Double => S, step: (S, Double) => S,
      emit: S => Seq[Double]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val proj = df.select(col(entity) +: order.map(col) :+
      col(valueCol).cast("double").as(valueCol): _*)
    val outSchema = StructType(proj.schema ++
      outCols.map(c => StructField(c, DoubleType, nullable = true)))
    val xIdx = proj.schema.length - 1
    val sorted = proj.repartition(col(entity))
      .sortWithinPartitions((col(entity) +: order.map(col)): _*)
    def round4(d: Double): Double =
      BigDecimal(d).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    sorted.mapPartitions { it =>
      // state machine over the entity-contiguous sorted stream
      var curKey: Any = null
      var started = false
      var state: Option[S] = None // None = poisoned by a null value
      it.map { r =>
        val k = r.get(0)
        val xNull = r.isNullAt(xIdx)
        val x = if (xNull) 0.0 else r.getDouble(xIdx)
        if (!started || k != curKey) {
          curKey = k; started = true
          state = if (xNull) None else Some(seed(x))
        } else {
          state = if (xNull) None else state.map(step(_, x))
        }
        val outs = state match {
          case Some(s) => emit(s).map(v => round4(v): Any)
          case None => outCols.map(_ => null: Any)
        }
        Row.fromSeq(r.toSeq ++ outs)
      }
    }(Encoders.row(outSchema))
  }

  /** Per-entity exponential moving average over event time — the
    * recursive smoother (sᵢ = α·xᵢ + (1−α)·sᵢ₋₁, s₀ = x₀) that a plain
    * window cannot express: every output depends on the ENTIRE ordered
    * prefix, and the algebraic unrolling (α Σ (1−α)^(i−j)·xⱼ) is
    * numerically explosive for long series, so the honest distributed
    * form is one sequential fold per entity, streamed over the external
    * sorter ([[foldSmoother]] — O(1) recurrence state per entity, no
    * per-entity-volume memory exposure, linear time).
    *
    * Determinism: the fold runs the recurrence SEQUENTIALLY in input
    * order in double — the exact arithmetic an oracle's recursive CTE
    * replays step for step, so the output is bit-identical across
    * engines (no summation-order residual; rounding is cosmetic).
    */
  def ewma(df: DataFrame, entity: String, order: Seq[String],
      valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val oneMinus = 1.0 - alpha // the same IEEE constant Catalyst folded
    foldSmoother[Double](df, entity, order, valueCol, Seq("ewma"),
      seed = x => x,
      step = (s, x) => alpha * x + oneMinus * s,
      emit = s => Seq(s))
  }

  /** Holt linear (level + trend) exponential smoothing per entity —
    * [[ewma]]'s two-state sibling, the classic double-smoother for
    * drifting series (an EWMA lags a trending signal by construction;
    * Holt tracks the slope): lᵢ = α·xᵢ + (1−α)(lᵢ₋₁ + bᵢ₋₁),
    * bᵢ = β(lᵢ − lᵢ₋₁) + (1−β)bᵢ₋₁, seeded l₀ = x₀, b₀ = 0. Emits per
    * input row the smoothed `level`, the `trend`, and the one-step
    * `forecast` (lᵢ + bᵢ — what the smoother would predict next).
    *
    * Same shape and determinism contract as [[ewma]] (one shuffle,
    * streamed fold, O(1) state, bit-identical to the recursive-CTE
    * oracle); the step arithmetic evaluates l before b exactly as the
    * oracle's inline recomputation does.
    */
  def holtSmooth(df: DataFrame, entity: String, order: Seq[String],
      valueCol: String, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta must be in [0, 1], got $beta")
    val oneMinusA = 1.0 - alpha
    val oneMinusB = 1.0 - beta
    foldSmoother[(Double, Double)](df, entity, order, valueCol,
      Seq("level", "trend", "forecast"),
      seed = x => (x, 0.0),
      step = { case ((l, b), x) =>
        val l2 = alpha * x + oneMinusA * (l + b)
        val b2 = beta * (l2 - l) + oneMinusB * b
        (l2, b2)
      },
      emit = { case (l, b) => Seq(l, b, l + b) })
  }

  def funnel(df: DataFrame, entity: String, order: Seq[Column],
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(entity)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // reached(k) stacks on reached(k-1): fold left, adding one flag column
    // per step. Same window spec throughout → one Exchange+Sort in the
    // physical plan (Spark chains the dependent Window operators over it).
    val flagged = steps.zipWithIndex.foldLeft(df) { case (acc, (step, i)) =>
      val hit =
        if (i == 0) when(col(typeCol) === step, 1).otherwise(0)
        else when(col(typeCol) === step && col(s"__r${i - 1}") === 1, 1)
          .otherwise(0)
      acc.withColumn(s"__r$i", max(hit).over(w))
    }
    val flags = steps.indices.map(i => max(col(s"__r$i")).as(s"__e$i"))
    val perEntity = flagged.groupBy(col(entity))
      .agg(flags.head, flags.tail: _*)
    perEntity.agg(
      sum(col("__e0")).as(s"step1_${steps.head}"),
      steps.indices.tail.map(i =>
        sum(col(s"__e$i")).as(s"step${i + 1}_${steps(i)}")): _*)
  }

  /** Daily activity per entity with calendar gaps filled: one row per
    * (entity, day) for EVERY day in the entity's [min(day), max(day)]
    * span, zero rows for silent days — the shape a forecasting or
    * time-series model trains on (implicit missingness made explicit).
    *
    * The day spine is `sequence(min_day, max_day)` + `explode` per
    * entity, derived from the daily AGGREGATE (entity-count sized, not
    * event-count sized), then left-joined back to the daily counts on
    * (entity, day) — the raw table is scanned once, and the explode
    * output is bounded by span length, not event count.
    *
    * Scale guard: an entity with an unbounded span (one event in 1970,
    * one today) explodes into span-many rows. `maxSpanDays` fails loudly
    * on spans a caller did not expect rather than silently materializing
    * them; raise it deliberately for genuinely long histories.
    */
  def gapFillDaily(df: DataFrame, entity: String, tsCol: String,
      value: String, maxSpanDays: Int = 3660): DataFrame = {
    val daily = df
      .groupBy(col(entity), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"), sum(col(value)).as("sum_v"))
    val spans = daily.groupBy(col(entity))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
    val guarded = spans.withColumn("__span",
      datediff(col("__d1"), col("__d0")) + 1)
      .withColumn("day", explode(when(col("__span") <= maxSpanDays,
        sequence(col("__d0"), col("__d1")))
        .otherwise(raise_error(concat(lit(s"gapFillDaily: span exceeds " +
          s"maxSpanDays=$maxSpanDays days for entity "),
          col(entity).cast("string"))))))
    guarded.select(col(entity), col("day"))
      .join(daily, Seq(entity, "day"), "left")
      .select(col(entity), col("day"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        round(coalesce(col("sum_v"), lit(0.0)), 4).as("sum_v"))
  }

  /** SCD2 intervalization of a change feed: per `key`, drop rows whose
    * `tracked` value is unchanged from the previous row (no-op updates —
    * the bulk of any refresh feed), then give each surviving change a
    * validity interval: `valid_from` = its own `tsCol`, `valid_to` = the
    * NEXT change's `tsCol` (NULL ⇒ currently-valid row). The output is
    * the slowly-changing-dimension type-2 table a warehouse join targets
    * with `valid_from <= t < valid_to` (the [[RangeJoin]] shape).
    *
    * One logical shuffle: the change-detecting `lag` and the
    * intervalizing `lead` use the same (key)-partitioning and `order`,
    * and the Filter between them preserves both, so the physical plan
    * sorts once and stacks both Window operators over a single Exchange
    * (plan-asserted in TimeSeriesSpec).
    *
    * Skew: a hot key serializes through one task, like every per-entity
    * window here — [[Windows.saltedRollingAvg]]'s chunking remedy does
    * NOT apply (lead/lag cross chunk boundaries), but change-feed keys
    * are entity ids, bounded by real-world update rates.
    *
    * `order` must be a deterministic total order (tiebreak column
    * alongside the timestamp) — equal-version ties would otherwise elect
    * different change rows across engines and retries.
    */
  def scd2(df: DataFrame, key: String, order: Seq[Column], tracked: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    // First row is detected explicitly (row_number === 1), NOT by
    // `__prev IS NULL`: a lag of NULL also occurs when the previous row's
    // tracked value is genuinely NULL, and conflating the two would keep
    // consecutive NULL tracked values as separate "changes" instead of
    // collapsing them under the null-safe <=> compare. Same window spec →
    // still one Exchange+Sort for all three window expressions.
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(tracked), 1).over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(tracked)))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev", "__rn")
  }

  /** Seasonal-naive anomaly flags: residual = value − value one
    * `season` back (the simplest seasonal model — "compare to the same
    * slot last cycle"), flagged when |residual| exceeds `k` × the mean
    * absolute residual of the trailing `window` observations. The
    * robust-baseline shape of a production data-quality monitor: the
    * threshold adapts per entity, and the mean-ABSOLUTE form doesn't
    * let one earlier spike square itself into a mask for the next one.
    *
    * Exactness discipline (the q151 quantized-contribution pattern):
    * residuals quantize to `scale`-grained longs per row BEFORE the
    * window sum, so the trailing aggregate is an exact integer sum —
    * immune to the accumulation-order difference between engines
    * (sliding-window sums are tree-aggregated in some engines,
    * linear in others; integers don't care) — and the flag itself is
    * the cross-multiplied INTEGER comparison
    * |q|·n > k·Σ|q| (no division, no float threshold, no boundary
    * ulps). Rows without a full `season` history carry no residual and
    * are dropped; rows with fewer than `minObs` trailing residuals get
    * a NULL flag (not enough evidence either way — the q184
    * three-valued honesty).
    *
    * One entity-keyed shuffle; the two window passes share the
    * partitioning (the second sorts the residual-bearing subset).
    *
    * @return input plus (residual_q, window_abs_sum, window_n,
    *         is_anomaly)
    */
  /** Retention cohort matrix — the product-analytics staple: bucket
    * every entity into the calendar period of its FIRST activity (its
    * cohort), then for each (cohort, period-offset) count how many of
    * that cohort were active, as an absolute count and as a fraction of
    * the cohort's size. `bucket` ∈ day | week | month (`date_trunc`
    * semantics — weeks are ISO Monday-start in both engines).
    *
    * Scale shape: the raw event stream reduces FIRST to distinct
    * (entity, period) — bounded by entities × periods, orders of
    * magnitude below event cardinality, and the only corpus-sized
    * shuffle. The cohort (min period per entity) rides a window over
    * the same entity partitioning, and because activity rows are
    * distinct per (entity, period), the per-cell aggregate is a plain
    * `count(*)` — no count-distinct buffer. Cohort size = the offset-0
    * cell (every entity is active in its own first period by
    * construction), recovered with a cohort-partitioned window over the
    * cohort×offset matrix — metadata-sized.
    *
    * Determinism: counts are exact longs; `retention` is one
    * long/long double division (engine-exact operands → engine-exact
    * quotient).
    *
    * @return (cohort, offset, n_active, cohort_size, retention) with
    *         offset in `bucket` units (days / weeks / months).
    */
  def retentionCohorts(df: DataFrame, entity: String, tsCol: String,
      bucket: String = "day"): DataFrame = {
    require(Set("day", "week", "month")(bucket),
      s"bucket must be day|week|month, got $bucket")
    val period = date_trunc(bucket, col(tsCol)).cast("date")
    val activity = df.select(col(entity), period.as("period")).distinct()
    val wEnt = Window.partitionBy(col(entity))
    val offset = bucket match {
      case "day"   => datediff(col("period"), col("cohort")).cast("long")
      case "week"  => (datediff(col("period"), col("cohort")) / 7)
        .cast("long")
      case "month" => (
        (year(col("period")) - year(col("cohort"))) * 12 +
          (month(col("period")) - month(col("cohort")))).cast("long")
    }
    val wCoh = Window.partitionBy(col("cohort"))
    activity
      .withColumn("cohort", min(col("period")).over(wEnt))
      .withColumn("offset", offset)
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("n_active"))
      .withColumn("cohort_size",
        max(when(col("offset") === 0, col("n_active"))).over(wCoh))
      .withColumn("retention",
        col("n_active").cast("double") / col("cohort_size").cast("double"))
  }

  /** Two-sided CUSUM mean-shift detection (Page 1954) per entity:
    * accumulate deviations from the entity's mean beyond a slack band
    * `slack`, and flag when either one-sided accumulation exceeds `h`
    * — the classic sequential changepoint statistic (a level shift
    * that a per-point threshold like [[seasonalAnomaly]] never sees
    * accumulates here linearly until it trips).
    *
    * The recursive definition s⁺ᵢ = max(0, s⁺ᵢ₋₁ + dᵢ) is computed in
    * CLOSED FORM — s⁺ᵢ = Sᵢ − min(0, min_{j≤i} Sⱼ) with Sᵢ the running
    * sum of dᵢ (induction: max(0, Sᵢ₋₁ − Mᵢ₋₁ + dᵢ) = Sᵢ −
    * min(Mᵢ₋₁, Sᵢ) = Sᵢ − Mᵢ) — so the whole statistic is two stacked
    * window passes over ONE entity-keyed sort, no sequential
    * per-entity fold and no driver loop.
    *
    * Exactness: values quantize to `scale`-granular longs; deviations
    * are cross-multiplied by the entity's row count n so the mean
    * never materializes as a float — dᵢ = qᵢ·n − Σq ∓ slack·scale·n,
    * all exact integer arithmetic, and the flag compares longs. The
    * emitted s⁺/s⁻/threshold are in (scale·n)-units; `n` rides along
    * for interpretation. Magnitudes: |d| ≤ range·scale·n, so the
    * running sum is bounded by (2·max|q| + slack·scale)·n² per entity.
    * TWO fail-loud guards enforce exactness instead of silently
    * wrapping: n ≤ 1e6 rows per entity, AND max|value_q| must fit the
    * remaining Long headroom (Long.MaxValue/4)/n² — so a 1e5-row
    * entity with |value| ~1e6 at scale 1e4 raises rather than emitting
    * wrong s⁺/s⁻ (the n-only cap would have passed it).
    *
    * Null values are excluded from n, Σq, and the accumulation (a
    * null deviation would poison every later row of the entity).
    */
  def cusum(df: DataFrame, entity: String, order: Seq[Column],
      valueCol: String, slack: Double, h: Double,
      scale: Long = 10000L): DataFrame = {
    require(slack >= 0 && h > 0, s"need slack >= 0, h > 0, got $slack $h")
    val wEnt = Window.partitionBy(col(entity))
    val wRun = Window.partitionBy(col(entity)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val slackQ = math.round(slack * scale)
    val hQ = math.round(h * scale)
    val base = df.filter(col(valueCol).isNotNull)
      .withColumn("value_q", round(col(valueCol) * scale, 0).cast("long"))
      .withColumn("__n",
        when(count(lit(1)).over(wEnt) <= 1000000L,
          count(lit(1)).over(wEnt))
          .otherwise(raise_error(concat(
            lit("cusum: entity group exceeds the exact-arithmetic " +
              "bound (1e6 rows): "), col(entity).cast("string")))))
      // fail-loud magnitude guard (ADVICE r17): the running sums are
      // bounded by (2·max|q| + slackQ)·n² per entity, so the row-count
      // cap alone does not prevent a silent long wrap for large |value|
      // at large scale. Enforce the actual bound: max|q| must fit in
      // the headroom (Long.MaxValue/4)/n² after the slack term — all
      // long arithmetic, n² ≤ 1e12 guaranteed by the __n guard above.
      .withColumn("__maxabs", max(abs(col("value_q"))).over(wEnt))
      .withColumn("__n",
        when(col("__maxabs") <=
            (lit(Long.MaxValue / 4) / (col("__n") * col("__n")) -
              lit(slackQ)) / lit(2L),
          col("__n"))
          .otherwise(raise_error(concat(
            lit("cusum: |value| x n exceeds the exact-long bound " +
              "(would overflow the running sum); lower `scale` or " +
              "split the entity: "), col(entity).cast("string"),
            lit(" max|q|="), col("__maxabs").cast("string")))))
      .withColumn("__sum", sum(col("value_q")).over(wEnt))
    val dev = col("value_q") * col("__n") - col("__sum")
    base
      .withColumn("__sp", sum(dev - lit(slackQ) * col("__n")).over(wRun))
      .withColumn("__sn", sum(-dev - lit(slackQ) * col("__n")).over(wRun))
      .withColumn("s_pos",
        col("__sp") - least(lit(0L), min(col("__sp")).over(wRun)))
      .withColumn("s_neg",
        col("__sn") - least(lit(0L), min(col("__sn")).over(wRun)))
      .withColumn("threshold_q", lit(hQ) * col("__n"))
      .withColumn("is_shift",
        col("s_pos") > col("threshold_q") ||
          col("s_neg") > col("threshold_q"))
      .withColumn("n", col("__n"))
      .drop("__n", "__sum", "__sp", "__sn", "__maxabs")
  }

  def seasonalAnomaly(df: DataFrame, entity: String, order: Seq[Column],
      value: String, season: Int, window: Int, minObs: Int, k: Int,
      scale: Long = 10000L): DataFrame = {
    require(season >= 1, s"season must be >= 1, got $season")
    require(window >= minObs && minObs >= 1,
      s"need window >= minObs >= 1, got window=$window minObs=$minObs")
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(col(entity)).orderBy(order: _*)
    val res = col(value) - lag(col(value), season).over(w)
    val wTrail = Window.partitionBy(col(entity)).orderBy(order: _*)
      .rowsBetween(-window, -1)
    df.withColumn("residual_q",
        round(res * scale, 0).cast("long"))
      .filter(col("residual_q").isNotNull)
      .withColumn("window_abs_sum", sum(abs(col("residual_q"))).over(wTrail))
      .withColumn("window_n", count(col("residual_q")).over(wTrail))
      .withColumn("is_anomaly", when(col("window_n") >= minObs,
        abs(col("residual_q")) * col("window_n") >
          lit(k.toLong) * col("window_abs_sum")))
  }

  /** First-order Markov transition matrix over per-entity event
    * sequences: P(next state | state), estimated from every adjacent
    * pair in each entity's `order`-sorted stream — the "where do users
    * go next" table behind journey Sankeys, next-step prediction
    * baselines, and anomalous-flow alerts. Each entity's LAST event
    * additionally transits to the `__end__` absorbing state so every
    * source row sums to exactly 1 (the standard chain completion; no
    * `__start__` row is emitted — marginal entry rates are a plain
    * state count).
    *
    * Scale shape (100 TB posture): the only shuffle keyed by entity is
    * the lag window (group size = one entity's history — the same
    * bound every window op here accepts, cf. [[saltedRollingTimeWindow]]
    * for the hot-entity escape); pairs then reduce map-side to the
    * (state, next) matrix, which is vocabulary², metadata-sized. The
    * per-source totals join is a broadcast of that same matrix
    * aggregated once more — the raw stream is read exactly once.
    *
    * Determinism: counts are exact longs; `p` is ONE long/long double
    * division (replayable bit-exactly by any engine). A NULL state is
    * a real token ("the tracker dropped the field") and would poison
    * both the groupBy and the lead — rows with NULL state are excluded
    * from the sequence BEFORE pairing (the stream splices around them,
    * matching how sessionizers treat malformed hits).
    *
    * @return (state, next_state, n, n_from, p) — one row per observed
    *         transition, `next_state = "__end__"` for terminal events
    */
  def transitionMatrix(df: DataFrame, entity: String, order: Seq[Column],
      stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(order: _*)
    val pairs = df
      .filter(col(entity).isNotNull && col(stateCol).isNotNull)
      .select(col(entity), col(stateCol).cast("string").as("state"),
        lead(col(stateCol).cast("string"), 1).over(w).as("__nx"))
      .select(col("state"),
        coalesce(col("__nx"), lit("__end__")).as("next_state"))
      .groupBy(col("state"), col("next_state"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("state"))
      .agg(sum(col("n")).as("n_from"))
    pairs.join(broadcast(totals), Seq("state"))
      .select(col("state"), col("next_state"), col("n"), col("n_from"),
        (col("n").cast("double") / col("n_from").cast("double")).as("p"))
  }
}
