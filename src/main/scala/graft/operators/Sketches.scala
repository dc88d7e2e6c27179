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
