package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate/sketch aggregates — the operators that replace their
  * exact counterparts first when data hits the 100 TB wall:
  *
  *  - [[approxProfile]]: HLL++ distinct counts and t-digest-style
  *    quantiles in ONE pass with fixed memory per group, vs the full
  *    shuffle + sort an exact distinct/percentile needs. Error is
  *    bounded (rsd for HLL, `accuracy` for percentile_approx) and
  *    unit-tested; values are engine-specific → rows-only at the
  *    correctness gate.
  *  - [[bloomSemiFilter]]: the bloom-filter semi-join — aggregate the
  *    (small, filtered) build side into a bloom filter, broadcast the
  *    few-KB sketch, and drop non-matching probe rows at scan speed. No
  *    false negatives (verified in tests); false positives only widen
  *    the output, which a downstream exact join removes. The classic
  *    pre-join reducer when the probe side is 100 TB and the join would
  *    otherwise shuffle all of it.
  */
object Sketches {

  /** One-pass approximate profile per group: HLL++ distinct count of
    * `distinctCol` (relative std dev `rsd`) + approximate quantiles of
    * `valueCol`, one scalar column per requested quantile (`p50`, `p95`,
    * `p99_9`, ...). All quantiles still come from ONE
    * `percentile_approx` sketch pass; they are split into scalars only at
    * the output boundary (scalar columns sort/compare everywhere arrays
    * don't, and named percentiles are the nicer API anyway).
    */
  def approxProfile(df: DataFrame, groupCols: Seq[String], distinctCol: String,
      valueCol: String, quantiles: Seq[Double] = Seq(0.5, 0.95),
      rsd: Double = 0.05, accuracy: Int = 10000): DataFrame = {
    val qs = quantiles.map(q => lit(q))
    val agged = df.groupBy(groupCols.map(col): _*)
      .agg(
        approx_count_distinct(col(distinctCol), rsd).as("approx_distinct"),
        percentile_approx(col(valueCol), array(qs: _*), lit(accuracy))
          .as("__q"),
        count(lit(1)).as("cnt"))
    val qCols = quantiles.zipWithIndex.map { case (q, i) =>
      element_at(col("__q"), i + 1).as(quantileColName(q))
    }
    agged.select(groupCols.map(col) ++
      (col("approx_distinct") +: qCols :+ col("cnt")): _*)
  }

  /** Error-bound audit artifact for [[approxProfile]] — the q91 pattern
    * applied to the HLL/quantile sketches: measure the approximation
    * quality IN-SPARK against the exact values on the same data and
    * configuration, so a drifted `rsd`/`accuracy` parameter (or an
    * upstream regression in the sketch) becomes a failing assertion
    * instead of silently passing a rows-only gate.
    *
    * Per group:
    *  - `hll_rel_err` = |approx_distinct − exact_distinct| /
    *    exact_distinct (NULL when the group has no distinct values);
    *  - `rank_eps_pXX` = how far each sketch cutpoint's value-rank
    *    interval [strictly-below+1, at-or-below] lands from its target
    *    rank q·n, as a fraction of n — 0 when the target rank is inside
    *    the interval; `percentile_approx` guarantees ≤ 1/accuracy.
    *
    * Cost: the sketch pass itself, one exact distinct aggregate, and ONE
    * extra scan with the group-count-sized cutpoint frame broadcast onto
    * it — an audit you can afford to run beside the sketch at any scale.
    */
  def profileError(df: DataFrame, groupCols: Seq[String], distinctCol: String,
      valueCol: String, quantiles: Seq[Double] = Seq(0.5, 0.95),
      rsd: Double = 0.05, accuracy: Int = 10000): DataFrame = {
    val gcols = groupCols.map(col)
    val qNames = quantiles.map(quantileColName)
    val approx = approxProfile(df, groupCols, distinctCol, valueCol,
      quantiles, rsd, accuracy)
    val exact = df.groupBy(gcols: _*)
      .agg(count_distinct(col(distinctCol)).as("exact_distinct"))
    val cuts = approx.select(
      (gcols :+ col("approx_distinct")) ++ qNames.map(col): _*)
    val rankAggs = qNames.flatMap { cn =>
      Seq(sum(when(col(valueCol) <= col(cn), 1L).otherwise(0L))
          .as(s"__le_$cn"),
        sum(when(col(valueCol) < col(cn), 1L).otherwise(0L))
          .as(s"__lt_$cn"))
    }
    val meas = df.join(broadcast(cuts), groupCols)
      .groupBy(gcols: _*)
      .agg(count(when(col(valueCol).isNotNull, lit(1))).as("n_values"),
        rankAggs: _*)
    val epsCols = qNames.map { cn =>
      val n = col("n_values").cast("double")
      val q = quantiles(qNames.indexOf(cn))
      val target = lit(q) * n
      val lo = col(s"__lt_$cn").cast("double") + 1.0
      val hi = col(s"__le_$cn").cast("double")
      when(col("n_values") > 0,
        round(greatest(lit(0.0), lo - target, target - hi) / n, 6))
        .as(s"rank_eps_$cn")
    }
    cuts.select(gcols :+ col("approx_distinct"): _*)
      .join(exact, groupCols)
      .join(meas, groupCols)
      .select((gcols ++ Seq(col("exact_distinct"), col("approx_distinct"),
        when(col("exact_distinct") > 0,
          round(abs(col("approx_distinct") - col("exact_distinct"))
            .cast("double") / col("exact_distinct").cast("double"), 6))
          .as("hll_rel_err"),
        col("n_values")) ++ epsCols): _*)
  }

  /** Observed false-positive-rate audit for [[bloomSemiFilter]] — one
    * probe-side pass classifying every row against BOTH the bloom sketch
    * and the exact build-key set. Output is a single row:
    * (probe_rows, null_probes, true_matches, bloom_pass, false_positives,
    * false_negatives, observed_fpp, design_fpp). `false_negatives` must
    * be 0 by construction (asserted in SketchesSpec); `observed_fpp` =
    * false_positives / (probe_rows − null_probes − true_matches) — null
    * probe keys can never match and are excluded — and `design_fpp` is
    * the theoretical (1 − e^(−kn/m))^k of the sketch's sizing — an
    * undersized `expectedItems` shows up as observed ≫ design.
    *
    * Scale shape: the bloom build is the same KB-sized collect as the
    * operator; the exact-membership side joins the probe against the
    * DISTINCT build keys (build is small by the operator's contract), so
    * the audit costs one probe scan more than the filter it audits.
    */
  def bloomFppAudit(probe: DataFrame, probeKey: Column,
      build: DataFrame, buildKey: Column,
      expectedItems: Long = 100000L): DataFrame = {
    val bf = build.agg(
      graft.functions.VectorFunctions
        .bloomFilterAgg(xxhash64(buildKey), expectedItems).as("__bf"))
      .collect()(0).getAs[Array[Byte]](0)
    // (m, k) from the ONE helper next to the aggregate (ADVICE r8): the
    // audit describes the sketch actually built, by construction.
    val (mBits, k) = graft.functions.VectorFunctions.bloomSizing(expectedItems)
    val m = mBits.toDouble
    val designFpp = math.pow(
      1.0 - math.exp(-k.toDouble * expectedItems / m), k.toDouble)
    val truth = build.select(buildKey.as("__k")).distinct()
    // NULL probe keys are classified separately: a null key can never be
    // a true match, and its xxhash64 degenerates to the seed — counting
    // such rows as bloom probes would distort observed_fpp (ADVICE r8),
    // so they are excluded from every bloom statistic and reported.
    probe
      .withColumn("__pk", probeKey)
      .withColumn("__bloom", col("__pk").isNotNull &&
        graft.functions.VectorFunctions
          .mightContain(lit(bf), xxhash64(col("__pk"))))
      .join(truth, col("__pk") === col("__k"), "left")
      .agg(
        count(lit(1)).as("probe_rows"),
        sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("null_probes"),
        sum(when(col("__k").isNotNull, 1L).otherwise(0L)).as("true_matches"),
        sum(when(col("__bloom"), 1L).otherwise(0L)).as("bloom_pass"),
        sum(when(col("__bloom") && col("__k").isNull, 1L).otherwise(0L))
          .as("false_positives"),
        sum(when(!col("__bloom") && col("__k").isNotNull, 1L).otherwise(0L))
          .as("false_negatives"))
      .withColumn("observed_fpp",
        when(col("probe_rows") - col("null_probes") > col("true_matches"),
          round(col("false_positives").cast("double") /
            (col("probe_rows") - col("null_probes") - col("true_matches"))
              .cast("double"), 6)))
      .withColumn("design_fpp", round(lit(designFpp), 6))
  }

  /** "p50", "p95", "p99_9" — column name for a quantile fraction. */
  private def quantileColName(q: Double): String = {
    val pct = BigDecimal(q * 100).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      .underlying.stripTrailingZeros.toPlainString
    "p" + pct.replace(".", "_")
  }

  /** Quantile bucketing without a global sort — the scale path for
    * `ntile(n) OVER (ORDER BY v)`, which funnels the entire dataset
    * through ONE task's sort at 100 TB. Instead: one
    * `percentile_approx` sketch pass computes n-1 cutpoints (a few
    * doubles, collected and inlined as a literal array — the same
    * collect-a-sketch-and-broadcast move as [[bloomSemiFilter]]), and
    * bucket assignment is a per-row binary-search-free comparison at
    * scan speed. Bucket POPULATIONS are approximate (cutpoint error ≤
    * the sketch accuracy); bucket ORDER and determinism are exact —
    * every run assigns a given row the same bucket for the same input.
    *
    * NULL values of `valueCol` get a NULL bucket (they are unrankable;
    * note this diverges from `ntile` over `ORDER BY v`, which sorts
    * nulls first into bucket 1). An empty or all-null input yields no
    * cutpoints and every non-null row — there are none — would land in
    * the top bucket; the guard keeps the sketch row's NULL from NPEing.
    *
    * `exact = true` swaps the sketch for SQL-standard `percentile_disc`
    * cutpoints (smallest value with cume_dist ≥ p — DuckDB's
    * `quantile_disc` computes the identical element, so the whole
    * operator becomes value-oracle-able). Exact percentiles sort the
    * full column through one aggregate: a correctness-gate /
    * small-data mode, NOT the 100 TB path — production stays on the
    * one-pass bounded-memory sketch.
    */
  def approxQuantileBuckets(df: DataFrame, valueCol: String, buckets: Int,
      accuracy: Int = 10000, out: String = "bucket",
      exact: Boolean = false): DataFrame = {
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val qs = (1 until buckets).map(_.toDouble / buckets)
    // sketch/sort on a double cast so integer-typed value columns work too
    val cuts: Seq[Double] =
      if (exact) {
        val aggs = qs.zipWithIndex.map { case (q, i) =>
          expr(s"percentile_disc(CAST($q AS DOUBLE)) WITHIN GROUP " +
            s"(ORDER BY CAST(`$valueCol` AS DOUBLE))").as(s"__c$i")
        }
        val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        qs.indices.filterNot(row.isNullAt).map(row.getDouble)
      } else {
        val row = df.agg(percentile_approx(col(valueCol).cast("double"),
            array(qs.map(lit): _*), lit(accuracy)).as("c"))
          .collect()(0)
        if (row.isNullAt(0)) Seq.empty[Double]
        else row.getAs[scala.collection.Seq[Double]]("c").toSeq
      }
    val assign = cuts.zipWithIndex.foldRight(lit(buckets): Column) {
      case ((cut, i), els) => when(col(valueCol) <= cut, lit(i + 1)).otherwise(els)
    }
    df.withColumn(out,
      when(col(valueCol).isNull, lit(null).cast("int")).otherwise(assign))
  }

  /** EXACT heavy hitters (values with frequency > `support` of all rows)
    * without a full-cardinality aggregation — the two-pass sketch
    * pattern:
    *
    *  1. `freqItems` (Spark's Karp/Misra-Gries-family sketch) finds a
    *     candidate SUPERSET in bounded memory — it can over-report but
    *     never misses a value above `support`, and the candidate list is
    *     at most ~1/support entries (collected + inlined, the
    *     [[bloomSemiFilter]] move);
    *  2. one exact counting pass over candidate rows only — aggregation
    *     state is |candidates|, not |distinct values|, which is the
    *     difference between a bounded hash map and an OOM when the
    *     column is open-vocabulary (tokens, URLs, user agents) at 100 TB.
    *
    * Output is exact (count > support · N, N via a broadcast 1-row
    * aggregate) — false positives from pass 1 die in pass 2's filter.
    */
  def exactHeavyHitters(df: DataFrame, valueCol: String,
      support: Double): DataFrame = {
    require(support >= 1e-4 && support < 1.0,
      s"support must be in [1e-4, 1), got $support")
    val cands = df.stat.freqItems(Array(valueCol), support)
      .collect()(0).getSeq[Any](0)
    val t = df.agg(count(lit(1)).as("__total"))
    df.filter(col(valueCol).isin(cands: _*))
      .groupBy(col(valueCol)).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(t))
      .filter(col("cnt").cast("double") >
        lit(support) * col("__total").cast("double"))
      .select(col(valueCol), col("cnt"))
  }

  /** Fixed-width histogram: per-bin row counts with [bin_lo, bin_hi)
    * bounds. A plain map-side-combinable aggregate — shuffle cardinality
    * is (value range / binWidth) bins, independent of row count, so the
    * distribution profile of a 100 TB column costs one scan + a
    * KB-sized shuffle. NULL values land in a NULL bin (surfaced, not
    * silently dropped — a spike there is a data-quality finding).
    *
    * Bin edges are floor(v / binWidth) * binWidth: float-exact in both
    * engines for sane widths, and half-open so a value on an edge
    * belongs to the higher bin.
    */
  def histogram(df: DataFrame, valueCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    val lo = floor(col(valueCol) / binWidth) * binWidth
    df.groupBy(lo.as("bin_lo"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("bin_lo"), (col("bin_lo") + binWidth).as("bin_hi"),
        col("cnt"))
  }

  /** HyperLogLog registers (Flajolet, Fusy, Gandouet, Meunier 2007) as a
    * STORED, MERGEABLE, engine-portable sketch TABLE — the distinct-count
    * artifact [[approxProfile]]'s `approx_count_distinct` cannot give you:
    * Spark's HLL++ state lives inside one aggregation and (as a
    * DataSketches blob in 3.5+) is opaque to any other engine, so per-shard
    * counts cannot be combined later, audited cross-engine, or maintained
    * incrementally without rescanning the corpus. Here the sketch IS a
    * DataFrame of `(group…, bucket, register)` rows:
    *
    *  - hash = the repo's md5 60-bit convention (`conv(md5[0,15), 16, 10)`,
    *    replayable in any SQL engine) over the key's string form;
    *  - bucket = top `p` hash bits; register = rho(tail) = leading zeros
    *    of the remaining `60-p` bits + 1 (via `length(bin(tail))` — exact
    *    integer/string arithmetic in both engines, no float log), an
    *    all-zero tail reads `60-p+1`, and registers cap at [[HllRhoCap]]
    *    (a 2^-50-probability event per bucket; the cap keeps the estimate
    *    arithmetic in exact long range);
    *  - the aggregate is `max(register)` per (group, bucket): map-side
    *    combinable, shuffle cardinality ≤ groups × 2^p REGARDLESS of row
    *    count — the whole point at 100 TB — and the output is SPARSE
    *    (untouched buckets are simply absent; [[hllEstimate]] adds them
    *    back as zeros).
    *
    * Because `max` is associative/commutative/idempotent, sketches of any
    * corpus partition [[hllMerge]] into exactly the sketch of the union —
    * the per-shard / per-day rollup discipline: sketch each ingest batch
    * once, store KBs, merge forever, never rescan. NULL keys contribute no
    * element (a null is not a distinct value) and are excluded here, like
    * [[bloomFppAudit]]'s null-probe carve-out.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], key: Column,
      p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 12, s"p must be in [4, 12], got $p")
    val w = HllHashBits - p
    val hv = conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long")
    val tail = hv.bitwiseAND(lit((1L << w) - 1L))
    val rho = when(tail === 0L, lit(w + 1))
      .otherwise(lit(w + 1) - length(bin(tail)))
    val gcols = groupCols.map(col)
    df.where(key.isNotNull)
      .select(gcols
        :+ shiftrightunsigned(hv, w).cast("int").as("bucket")
        :+ least(rho, lit(HllRhoCap)).cast("int").as("register"): _*)
      .groupBy(gcols :+ col("bucket"): _*)
      .agg(max(col("register")).as("register"))
  }

  /** Merge two [[hllRegisters]] sketches over the same group/`p` into the
    * sketch of the UNION of their inputs — exactly, by `max`'s
    * associativity (asserted register-for-register in SketchesSpec). The
    * incremental-ingest form: `merged = hllMerge(stored, hllRegisters(batch))`
    * touches only sketch rows (≤ groups × 2^p), never the corpus.
    */
  def hllMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("register")).as("register"))

  /** Distinct-count estimate from an [[hllRegisters]] sketch, with the
    * published small-range correction: raw HLL
    * `E = alpha_m · m² / Σ 2^(−M_j)` switches to linear counting
    * `m · ln(m / V)` when `E ≤ 2.5m` and zero registers exist (V = count
    * of untouched buckets). The harmonic sum is EXACT integer arithmetic:
    * each term scaled by 2^[[HllRhoCap]] is `1L << (cap − M_j)` (absent
    * buckets contribute `1L << cap`), so `s_scaled` is an engine-exact
    * long (p ≤ 12 keeps the sum under 2^63) and the estimate is one
    * mirrored double expression off exact integers — the only cross-engine
    * residual is `ln`'s final ulp, absorbed by the 4-decimal round (q95's
    * precedent). Output per group: `m`, `buckets_set`, `zero_buckets`,
    * `s_scaled` (the hash-exact gate columns) + `est_distinct`.
    */
  def hllEstimate(sketch: DataFrame, groupCols: Seq[String],
      p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 12, s"p must be in [4, 12], got $p")
    val m = 1 << p
    val mD = m.toDouble
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / mD)
    }
    val gcols = groupCols.map(col)
    sketch.groupBy(gcols: _*)
      .agg(count(lit(1)).as("buckets_set"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoCap - register)"))
          .as("__s_present"))
      .withColumn("zero_buckets",
        (lit(m.toLong) - col("buckets_set")).as("zero_buckets"))
      .withColumn("s_scaled",
        col("__s_present") + col("zero_buckets") * lit(1L << HllRhoCap))
      // ((alpha · m · m) · 2^cap) / S — association order mirrored in SQL
      .withColumn("__raw",
        lit(alpha * mD * mD) * lit(math.pow(2.0, HllRhoCap)) /
          col("s_scaled").cast("double"))
      .withColumn("est_distinct",
        round(when(col("__raw") <= lit(2.5 * mD) && col("zero_buckets") > 0L,
          lit(mD) * log(lit(mD) / col("zero_buckets").cast("double")))
          .otherwise(col("__raw")), 4))
      .select(gcols ++ Seq(lit(m).as("m"), col("buckets_set"),
        col("zero_buckets"), col("s_scaled"), col("est_distinct")): _*)
  }

  /** [[hllRegisters]] ∘ [[hllEstimate]] in one call — per-group distinct
    * counts of `key` with HLL's 1.04/√m error at 2^p registers of state.
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], key: Column,
      p: Int = 10): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, key, p), groupCols, p)

  /** Rolling-window distinct counts — "7-day distinct users, per day" —
    * via the sketch algebra: distinct counts don't sum across days, so
    * the naive form re-scans `window` days of raw events PER output day
    * (window× the corpus at 100 TB, every day). Instead: sketch each
    * time bucket ONCE ([[hllRegisters]] keyed by `groupCols :+ bucket`),
    * then every register row fans out to the `window` target buckets it
    * contributes to (`explode(sequence(b, b+window−1))` — register rows,
    * never events) and max-merges per target — [[hllMerge]]'s arithmetic
    * as a window. Work after the base sketch is sketch-cardinality ×
    * window, independent of event count; incremental by construction
    * (yesterday's per-day sketches are already stored — only the new
    * day's registers are computed, the merge re-runs on KBs).
    *
    * `bucket` must be an integral bucket index (e.g. `ts_ns div 86400e9`
    * for days — integer arithmetic, engine-portable; NULL buckets are
    * unplaceable in time and dropped). Output rows cover every bucket
    * OBSERVED anywhere in `df` (a group with mass only earlier in a
    * window still gets that window's row; no phantom buckets past the
    * data's edge), estimate columns as [[hllEstimate]].
    */
  def hllRollingDistinct(df: DataFrame, groupCols: Seq[String], key: Column,
      bucket: Column, window: Int, p: Int = 10,
      out: String = "bucket_id"): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val sk = hllRegisters(df.withColumn(out, bucket.cast("long")),
      groupCols :+ out, key, p)
    val targets = df.select(bucket.cast("long").as("__t")).distinct()
    val gcols = groupCols.map(col)
    val merged = sk
      .withColumn("__t",
        explode(sequence(col(out), col(out) + lit(window - 1L))))
      .join(broadcast(targets), Seq("__t"), "left_semi")
      .groupBy(gcols ++ Seq(col("__t"), col("bucket")): _*)
      .agg(max(col("register")).as("register"))
      .withColumnRenamed("__t", out)
    hllEstimate(merged, groupCols :+ out, p)
  }

  /** KMV (k-minimum-values) sketch, Beyer et al. SIGMOD 2007 — the
    * DISTINCT-count sketch that, unlike [[hllRegisters]], supports SET
    * OPERATIONS: because the state is actual hash SAMPLES (the k
    * smallest distinct 60-bit md5 hashes per group, the shared oracle
    * convention), two sketches intersect/union meaningfully —
    * [[kmvOverlap]] estimates |A∩B| and Jaccard between two audiences
    * without ever joining the raw sets. The aggregate is the custom
    * bounded-buffer [[graft.functions.TopKAggregate.minKDistinct]]
    * (map-side ≤ k longs per group per task — never a distinct-sort);
    * output is the sparse (group…, hv) table, ≤ k rows per group,
    * mergeable forever like the HLL registers ([[kmvMerge]]). NULL keys
    * contribute nothing; hash collisions conflate two elements with
    * probability ≈ n²/2⁶¹ — irrelevant below ~10⁹ distinct per group.
    */
  def kmvSketch(df: DataFrame, groupCols: Seq[String], key: Column,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val hv = conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long")
    val gcols = groupCols.map(col)
    df.where(key.isNotNull)
      .select(gcols :+ hv.as("__hv"): _*)
      .groupBy(gcols: _*)
      .agg(graft.functions.TopKAggregate.minKDistinct(col("__hv"), k)
        .as("__ks"))
      .select(gcols :+ explode(col("__ks")).as("hv"): _*)
  }

  /** Merge two [[kmvSketch]] tables (same groups, same k) into the
    * sketch of the union of their inputs — exact, because "k smallest
    * distinct of (k smallest of A ∪ k smallest of B)" = "k smallest
    * distinct of A ∪ B" (asserted in SketchesSpec).
    */
  def kmvMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String],
      k: Int = 256): DataFrame = {
    val gcols = groupCols.map(col)
    a.unionByName(b)
      .groupBy(gcols: _*)
      .agg(graft.functions.TopKAggregate.minKDistinct(col("hv"), k)
        .as("__ks"))
      .select(gcols :+ explode(col("__ks")).as("hv"): _*)
  }

  /** Distinct-count estimate from a [[kmvSketch]]: with fewer than k
    * hashes the sketch saw the whole set (estimate = exact count);
    * otherwise the k-th smallest hash U₍k₎ of a uniform [0, 2⁶⁰) sample
    * estimates D ≈ (k−1)·2⁶⁰ / U₍k₎ (Beyer et al.'s unbiased form).
    * `n_hashes` and `kth_hash` are hash-exact gate columns; the
    * estimate is ONE mirrored double expression off exact longs — no
    * transcendentals at all in this family.
    */
  def kmvEstimate(sketch: DataFrame, groupCols: Seq[String],
      k: Int = 256): DataFrame = {
    val gcols = groupCols.map(col)
    sketch.groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_hashes"), max(col("hv")).as("kth_hash"))
      .withColumn("est_distinct",
        round(when(col("n_hashes") < k, col("n_hashes").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(math.pow(2.0, 60)) /
            col("kth_hash").cast("double")), 4))
  }

  /** Audience overlap from two [[kmvSketch]] tables (Beyer et al. §4.3):
    * per group, the union sketch K = [[kmvMerge]](A, B) estimates
    * D_union; the Jaccard estimate is ρ = |K ∩ A ∩ B| / |K| (how many
    * of the union's bottom-k samples lie in BOTH sets); and
    * |A∩B| ≈ ρ · D_union. One sketch-sized join chain — the raw sets
    * were discarded at sketch time; this is "users who did BOTH,
    * per segment" at 100 TB for the price of two stored KB tables.
    * Groups present in only one sketch get no row (no overlap to
    * estimate); `n_union < k` means every distinct element was sampled
    * and the counts are exact.
    */
  def kmvOverlap(a: DataFrame, b: DataFrame, groupCols: Seq[String],
      k: Int = 256): DataFrame = {
    val u = kmvMerge(a, b, groupCols, k)
    val joinCols = groupCols :+ "hv"
    val common = u
      .join(a.select(joinCols.map(col): _*), joinCols, "left_semi")
      .join(b.select(joinCols.map(col): _*), joinCols, "left_semi")
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_common"))
    val gcols = groupCols.map(col)
    kmvEstimate(u, groupCols, k)
      .withColumnRenamed("n_hashes", "n_union")
      .withColumnRenamed("est_distinct", "est_union")
      .drop("kth_hash")
      .join(common, groupCols, "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .withColumn("jaccard_est",
        round(col("n_common").cast("double") /
          col("n_union").cast("double"), 4))
      .withColumn("est_intersection",
        round(col("n_common").cast("double") /
          col("n_union").cast("double") * col("est_union"), 4))
      .select(gcols ++ Seq(col("n_union"), col("n_common"),
        col("est_union"), col("jaccard_est"),
        col("est_intersection")): _*)
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005) — the FREQUENCY
    * member of the mergeable-sketch family ([[hllRegisters]] counts
    * distincts, [[kmvSketch]] intersects sets, this answers "how often
    * does X occur" for an open vocabulary in fixed space): a depth ×
    * width counter grid, each element incrementing one counter per hash
    * row; a point estimate is the MIN of its depth counters —
    * overestimate-only (collisions add, never subtract), with
    * err ≤ e·N/width at probability 1−e^−depth. State is the sparse
    * (group…, r, c, cnt) table, ≤ groups × depth × width rows
    * REGARDLESS of stream length; counters are exact integer sums, so
    * unlike every classical CMS implementation this one is fully
    * value-oracled — the md5 row-hash convention replays in any engine.
    * [[cmsMerge]] is counter addition (sketch of the concatenation, by
    * linearity). NULL keys contribute nothing.
    */
  def cmsSketch(df: DataFrame, groupCols: Seq[String], key: Column,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1, 8], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val gcols = groupCols.map(col)
    df.where(key.isNotNull)
      .select(gcols :+ key.cast("string").as("__k"): _*)
      .select(gcols ++ Seq(col("__k"),
        explode(sequence(lit(0), lit(depth - 1))).as("r")): _*)
      .select(gcols ++ Seq(col("r"),
        (conv(substring(md5(concat(col("__k"), lit(":"),
          col("r").cast("string"))), 1, 15), 16, 10).cast("long")
          % width).as("c")): _*)
      .groupBy(gcols ++ Seq(col("r"), col("c")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two [[cmsSketch]] tables (same groups/depth/width): counter
    * addition — exactly the sketch of the concatenated inputs.
    */
  def cmsMerge(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    val kcols = (groupCols ++ Seq("r", "c")).map(col)
    a.unionByName(b).groupBy(kcols: _*).agg(sum(col("cnt")).as("cnt"))
  }

  /** Point-frequency estimates from a [[cmsSketch]] for the keys in
    * `probes` (distinct per group): min over the key's depth counters,
    * absent counters read 0. Overestimate-only: est ≥ the true count,
    * always (spec-asserted with planted collisions). All other probe
    * columns ride through; the sketch side of the join is ≤ groups ×
    * depth × width rows — broadcast-class by construction.
    */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 1024,
      groupCols: Seq[String] = Nil, out: String = "est_cnt"): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1, 8], got $depth")
    val idCols = (groupCols :+ keyCol).map(col)
    val est = probes.select(idCols: _*).distinct()
      .withColumn("r", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("c",
        conv(substring(md5(concat(col(keyCol).cast("string"), lit(":"),
          col("r").cast("string"))), 1, 15), 16, 10).cast("long") % width)
      .join(broadcast(sketch), groupCols ++ Seq("r", "c"), "left")
      .groupBy(idCols: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as(out))
    probes.join(est, groupCols :+ keyCol)
  }

  /** 60-bit hash convention shared with the oracle (md5 hex [0,15)). */
  private val HllHashBits = 60

  /** Register cap: keeps `1L << (cap − register)` non-negative and the
    * harmonic sum in exact long range; a register would exceed it with
    * probability 2^-50 per bucket.
    */
  private[graft] val HllRhoCap = 50

  /** Maximum quantized value the HDR bucket arithmetic guarantees exact
    * (2^50 — far above any `scale`-quantized metric this engine meets;
    * the decode multiplications stay inside long range with margin).
    */
  private val HdrMaxQ = 1L << 50

  private def hdrRequirePrecision(precision: Int): Unit =
    require(precision >= 1 && precision <= 8,
      s"precision must be in [1, 8], got $precision")

  /** Log-linear quantile sketch — the mergeable, STORED, value-oracled
    * member the sketch family was missing (distinct = HLL/KMV,
    * frequency = CMS, quantiles = this). The bucketing is the
    * HDR-histogram / DDSketch log-linear scheme (Tene's HdrHistogram;
    * Masson et al., VLDB'19 use a pure-log gamma — we keep the
    * HDR power-of-two + linear-mantissa form because it is EXACT
    * integer arithmetic, so the sketch itself hash-compares across
    * engines, the family's convention): values quantize to
    * `scale`-granular positive longs q, and bucket
    *
    *   idx = q                                   if q < 2^(precision+1)
    *   idx = (e−s)·2^s + (q >> (e−s))            otherwise,
    *
    * with s = `precision`, e = floor(log₂ q) = length(bin(q)) − 1.
    * Buckets are contiguous, monotone in q, exact below 2^(s+1), and
    * one power-of-two range splits into 2^s linear sub-buckets above —
    * relative bucket width ≤ 2^−s, so a midpoint estimate carries
    * relative error ≤ 2^−(s+1) (1/16 at the default s = 3) plus the
    * half-ulp of quantization. Counters are exact longs; merge is
    * counter addition (≡ sketching the union, by associativity);
    * the estimator walks a cumulative sum — no transcendental
    * anywhere, both engines replay every step bit-for-bit.
    *
    * Scale shape: one map-side-combined (group, idx) count — sketch
    * cardinality is ≤ groups × (2^s·(50−s) + 2^(s+1)) ≈ a few hundred
    * rows per group regardless of corpus size; runs unchanged as a
    * complete-mode stream (state = sketch cardinality, the family
    * discipline). Zero quantizes to its own EXACT bucket (idx 0 — the
    * linear branch covers it; a metrics histogram silently swallowing
    * zeros IS the incident); negative or null values fail loudly (the
    * log-linear scheme is for non-negative metrics — DDSketch handles
    * signed data with a mirrored second histogram, out of scope here);
    * values past 2^50/scale likewise.
    *
    * @return (groupCols..., idx, n)
    */
  def hdrSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      scale: Long = 100L, precision: Int = 3): DataFrame = {
    hdrRequirePrecision(precision)
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val s = precision
    val q0 = round(col(valueCol) * scale, 0).cast("long")
    val q = when(q0.isNotNull && q0 >= 0L && q0 < HdrMaxQ, q0)
      .otherwise(raise_error(concat(
        lit(s"hdrSketch: value out of [0, 2^50/$scale] on "),
        col(valueCol).cast("string"))))
    val e = (length(bin(q)) - lit(1)).cast("int")
    val m = call_function("shiftright", q, e - lit(s))
    val idx = when(q < lit(1L << (s + 1)), q)
      .otherwise((e - lit(s)).cast("long") * lit(1L << s) + m)
    val gcols = groupCols.map(col)
    df.select(gcols :+ idx.as("idx"): _*)
      .groupBy(gcols :+ col("idx"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Merge two [[hdrSketch]] tables (same groups, same scale/precision)
    * into the sketch of the union of their inputs — exact, by the
    * associativity of counter addition (asserted bucket-for-bucket in
    * SketchesSpec). The incremental-ingest form: merge the batch's
    * sketch into the stored one; the corpus is never rescanned.
    */
  def hdrMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame = {
    val gcols = groupCols.map(col)
    a.unionByName(b)
      .groupBy(gcols :+ col("idx"): _*)
      .agg(sum(col("n")).as("n"))
  }

  /** Quantile estimates from a stored [[hdrSketch]]: for each group and
    * each requested quantile p, the `percentile_disc`-convention bucket
    * — the lowest idx whose cumulative count reaches ⌈p·total⌉ — decoded
    * to its exact integer bounds [lo_q, hi_q] and a midpoint estimate in
    * original units. The selection is exact integer arithmetic
    * (p quantizes to parts-per-million and the rank test
    * cross-multiplies: cum·10⁶ ≥ p_ppm·total), so no float boundary
    * picks a bucket.
    *
    * Everything here is sketch-cardinality-sized: a cumulative window
    * per group, a broadcast quantile list, one min-idx aggregate.
    *
    * @return (groupCols..., p, idx, lo_q, hi_q, n_total, est) — est =
    *         midpoint/scale, one long-derived division, engine-exact
    */
  def hdrQuantiles(sketch: DataFrame, groupCols: Seq[String],
      quantiles: Seq[Double], scale: Long = 100L,
      precision: Int = 3): DataFrame = {
    hdrRequirePrecision(precision)
    require(quantiles.nonEmpty, "need at least one quantile")
    require(quantiles.forall(p => p > 0 && p <= 1),
      s"quantiles must be in (0, 1], got $quantiles")
    val s = precision
    val gcols = groupCols.map(col)
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(col("idx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wTot = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*)
    val ps = quantiles.map(p => math.round(p * 1e6)).distinct.sorted
    val cum = sketch
      .withColumn("__cum", sum(col("n")).over(wCum))
      .withColumn("__tot", sum(col("n")).over(wTot))
    val pFrame = sketch.sparkSession.range(1)
      .select(explode(typedlit(ps)).as("p_ppm"))
    val picked = cum
      .crossJoin(broadcast(pFrame))
      .where(col("__cum") * lit(1000000L) >= col("p_ppm") * col("__tot"))
      .groupBy(gcols :+ col("p_ppm"): _*)
      .agg(min(col("idx")).as("idx"), max(col("__tot")).as("n_total"))
    // decode: j = idx div 2^s − 1, m = idx − j·2^s, [m<<j, ((m+1)<<j)−1]
    val j = (call_function("shiftright", col("idx"), lit(s)) - lit(1L))
      .cast("int")
    val lo = when(col("idx") < lit(1L << (s + 1)), col("idx"))
      .otherwise(call_function("shiftleft",
        col("idx") - j.cast("long") * lit(1L << s), j))
    val hi = when(col("idx") < lit(1L << (s + 1)), col("idx"))
      .otherwise(call_function("shiftleft",
        col("idx") - j.cast("long") * lit(1L << s) + lit(1L), j) - lit(1L))
    picked
      .withColumn("p", col("p_ppm").cast("double") / lit(1e6))
      .withColumn("lo_q", lo)
      .withColumn("hi_q", hi)
      .withColumn("est",
        ((col("lo_q") + col("hi_q")).cast("double") / lit(2.0)) /
          lit(scale.toDouble))
      .select(gcols ++ Seq(col("p"), col("idx"), col("lo_q"), col("hi_q"),
        col("n_total"), col("est")): _*)
  }

  /** Bloom-filter semi-join: keep probe rows whose `probeKey` might be in
    * the build side's `buildKey` set. `expectedItems` sizes the sketch
    * (bits ≈ 8× items keeps FPP ≈ 2%).
    */
  def bloomSemiFilter(probe: DataFrame, probeKey: Column,
      build: DataFrame, buildKey: Column,
      expectedItems: Long = 100000L): DataFrame = {
    // The sketch is a few KB by construction; materializing it to the
    // driver and inlining it as a literal is the same move Spark's
    // runtime row-group filtering makes (might_contain requires a
    // constant bloom). The probe side — the 100 TB side — never moves.
    val bf = build.agg(
      graft.functions.VectorFunctions
        .bloomFilterAgg(xxhash64(buildKey), expectedItems).as("__bf"))
      .collect()(0).getAs[Array[Byte]](0)
    probe.filter(graft.functions.VectorFunctions
      .mightContain(lit(bf), xxhash64(probeKey)))
  }
}
