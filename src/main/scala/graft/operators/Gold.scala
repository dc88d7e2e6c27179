package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gold-layer analytics (SURVEY.md §2.4-2.6, reference Weather_API.py:500-1195).
  *
  * Design intent vs the reference: the reference collects full tables to the
  * driver (`toPandas`, 12 call sites) and does grouping/trend/corr client-side
  * (SURVEY.md §3 E3). Here every aggregate runs distributed and only the final
  * small result crosses to the driver — the difference between shipping a few
  * KB and shipping 100 TB.
  */
object Gold {

  /** A3+F2 — monthly climatology: avg of `valueCol` per (entity, month). */
  def monthlyClimatology(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      valueCol: String): DataFrame =
    df.groupBy(col(entityCol), month(col(tsCol)).as("month"))
      .agg(avg(col(valueCol)).as(s"avg_$valueCol"))

  /** F4+A3 — month-year bucketed averages (Weather_API.py:846,910). */
  def monthYearSummary(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "monthYearSummary needs at least one value column")
    df.groupBy(col(entityCol), date_format(col(tsCol), "yyyy-MM").as("month_year"))
      .agg(
        avg(col(valueCols.head)).as(s"avg_${valueCols.head}"),
        valueCols.tail.map(c => avg(col(c)).as(s"avg_$c")): _*)
  }

  /** A2+A8 — yearly mean then least-squares linear trend over the yearly
    * means (Weather_API.py:981-993 `np.polyfit(year, avg, 1)`), fully
    * distributed via built-in `regr_slope`/`regr_intercept`.
    */
  def yearlyTrend(df: DataFrame, tsCol: String, valueCol: String): DataFrame = {
    val yearly = df
      .groupBy(year(col(tsCol)).as("year"))
      .agg(avg(col(valueCol)).as("yearly_avg"))
    yearly.agg(
      regr_slope(col("yearly_avg"), col("year")).as("slope"),
      regr_intercept(col("yearly_avg"), col("year")).as("intercept"))
  }

  /** A7 — Pearson correlation (Weather_API.py:1171), distributed single pass. */
  def correlation(df: DataFrame, a: String, b: String): DataFrame =
    df.agg(corr(col(a), col(b)).as("correlation"))

  /** O1+P5+P1 — per-entity ordered series (Weather_API.py:522-527).
    * The filter pushes down to the Parquet scan; the sort is a range
    * partition + local sort (no single-node bottleneck at scale).
    */
  def entitySeries(
      df: DataFrame,
      entityCol: String,
      entity: Any,
      orderCol: String,
      cols: Seq[String]): DataFrame =
    df.filter(col(entityCol) === lit(entity))
      .select(cols.map(col): _*)
      .orderBy(col(orderCol))

  /** O1+O2 — deterministic top-k: ties broken by `tieBreak` so results are
    * stable across partitionings. Spark plans orderBy+limit as TakeOrdered
    * (per-partition top-k, then merge k·p rows on the driver) — no global
    * sort materialization.
    */
  def topK(df: DataFrame, k: Int, ordering: Column*): DataFrame =
    df.orderBy(ordering: _*).limit(k)

  /** P10 — value remap via literal map lookup (Weather_API.py:1033 pandas
    * `replace`). `element_at` on a `typedLit` map is codegen'd and avoids a
    * join for small static vocabularies.
    */
  def remap(df: DataFrame, column: String, mapping: Map[String, String],
      default: Column): DataFrame = {
    val m = typedLit(mapping)
    // try_element_at (not element_at): ANSI mode is on by default in Spark 4
    // and plain element_at throws on a missing map key.
    df.withColumn(column, coalesce(try_element_at(m, col(column)), default))
  }
}
