package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A9 — long→wide pivot (SURVEY.md §2.4, reference Weather_API.py:76-91).
  *
  * The reference pivots in a single-threaded driver dict; here it is a
  * distributed `groupBy(...).pivot(...)`. Passing the explicit value
  * vocabulary skips the extra distinct-values job Spark would otherwise run —
  * at 100 TB that job is a full scan, so the explicit list matters.
  *
  * Tie-breaking: the reference is last-write-wins per measurement
  * (Weather_API.py:91) and first-seen for carried attributes
  * (Weather_API.py:86-88); with ≤1 value per (key, pivotCol) the choice is
  * unobservable (SURVEY.md §7.4). We use order-insensitive aggregates
  * (`max`/`avg`) so results are deterministic under any partitioning —
  * `first` without ordering is nondeterministic in a distributed shuffle.
  */
object Pivot {

  /** Pivot `valueCol` over the known `vocabulary` of `pivotCol` values,
    * grouping by `keys`. One output column per vocabulary entry.
    *
    * @param agg cell aggregate; defaults to `max` (order-insensitive stand-in
    *            for the reference's ≤1-value-per-cell "first"). Callers with
    *            many values per cell pass e.g. `c => round(sum(c), 2)`.
    */
  def longToWide(
      df: DataFrame,
      keys: Seq[String],
      pivotCol: String,
      vocabulary: Seq[String],
      valueCol: String,
      agg: Column => Column = max): DataFrame =
    df.groupBy(keys.map(col): _*)
      .pivot(pivotCol, vocabulary)
      .agg(agg(col(valueCol)))
}
