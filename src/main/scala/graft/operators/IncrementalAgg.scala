package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-(entity, day) statistics
  * table current by merging a new event batch into the stored state,
  * instead of recomputing over all history — at 100 TB the recompute is
  * the difference between scanning a day and scanning three years.
  *
  * The contract is algebraic: every carried measure is a semigroup merge
  * (counts add, sums add, min/max fold), so
  * `merge(state(≤ t1), state(batch(t1, t2])) ≡ state(≤ t2)` exactly —
  * and the gate query (q114) enforces precisely that equality against a
  * DuckDB full recompute. Measures that do NOT merge (exact medians,
  * distinct counts) don't belong here; use sketches with mergeable state
  * ([[Sketches.approxProfile]]'s HLL) for those.
  *
  * The reference recomputes its Gold climatology from scratch each run
  * (single-notebook scope); this is the operator that makes the same
  * output maintainable under continuous ingest.
  */
object IncrementalAgg {

  /** Per-(entity, day) statistics state: one scan, one map-side-combined
    * aggregate — the shape both initial builds and per-batch deltas use.
    * `sum_v` stays unrounded: state is merged downstream, and rounding
    * partial state would compound (round only at presentation, see
    * q114).
    */
  def dailyState(events: DataFrame, entity: String, tsCol: String,
      value: String): DataFrame =
    events.groupBy(col(entity), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"), sum(col(value)).as("sum_v"),
        min(col(value)).as("min_v"), max(col(value)).as("max_v"))

  /** Merge two state tables (stored state + a batch delta, or any two
    * disjoint-history states): union + re-aggregate with each measure's
    * merge function. Both inputs are aggregate-sized — the event-grained
    * scan happened in [[dailyState]] — so the merge shuffle carries
    * (entity-days × 2) rows at most, regardless of event volume. A key
    * present in only one side passes through unchanged (union + agg, not
    * a join: no null-vs-absent bookkeeping).
    */
  def mergeDaily(state: DataFrame, delta: DataFrame,
      entity: String): DataFrame = {
    val cols = Seq(entity, "day", "cnt", "sum_v", "min_v", "max_v")
    require(state.columns.toSeq == cols && delta.columns.toSeq == cols,
      s"state schemas must both be $cols, got ${state.columns.toSeq} " +
        s"and ${delta.columns.toSeq}")
    state.unionByName(delta)
      .groupBy(col(entity), col("day"))
      .agg(sum(col("cnt")).as("cnt"), sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
  }
}
