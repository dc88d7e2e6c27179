package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Null-imputation composites — the reference Silver layer's core semantics
  * (SURVEY.md §2.9, reference Weather_API.py:341-448), re-expressed as pure
  * `DataFrame => DataFrame` stages.
  *
  * Scale notes (100 TB): [[imputeByGroupAvg]] is an aggregate + join back. The
  * aggregate side is tiny relative to the fact (one row per group), so the
  * join-back is broadcast when it fits — no second shuffle of the fact table.
  * Spark plans the groupBy with partial (map-side) aggregation, so the only
  * full shuffle is the one the aggregation itself needs.
  */
object Imputation {

  /** I1 — group-average imputation (Weather_API.py:341-391).
    *
    * Per row: keep the original value if non-null, else the group average if
    * the group has one, else `default`. Null group keys never match the join
    * (SQL null semantics, preserved intentionally — Weather_API.py:352-358),
    * so rows with null keys fall through to `default`.
    *
    * @param df        input
    * @param valueCol  column to impute
    * @param groupKeys grouping keys for the average
    * @param default   terminal fallback (reference uses 0)
    * @param broadcastAvgs broadcast the per-group averages (one row per group;
    *                  almost always tiny vs the fact table)
    */
  def imputeByGroupAvg(
      df: DataFrame,
      valueCol: String,
      groupKeys: Seq[String],
      default: Double = 0.0,
      broadcastAvgs: Boolean = true): DataFrame =
    imputeByGroupAvg(df, Seq(valueCol), groupKeys, default, broadcastAvgs)

  /** Multi-column variant: one aggregation + one join imputes all
    * `valueCols` (the reference's single-join shape for avg_wind_speed +
    * wind_direction_2min, Weather_API.py:344-371) — N columns cost the
    * same shuffle as one.
    */
  def imputeByGroupAvg(
      df: DataFrame,
      valueCols: Seq[String],
      groupKeys: Seq[String],
      default: Double,
      broadcastAvgs: Boolean): DataFrame = {
    require(valueCols.nonEmpty, "imputeByGroupAvg needs at least one value column")
    def avgCol(c: String) = s"__avg_$c"
    // Rename the aggregate-side keys: the averages derive from `df`, so an
    // unrenamed equi-join would be a self-join with ambiguous columns.
    val aggs = valueCols.map(c => avg(col(c)).as(avgCol(c)))
    val keyed = df
      .groupBy(groupKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(groupKeys.map(k => col(k).as(s"__key_$k")) ++
        valueCols.map(c => col(avgCol(c))): _*)
    val avgs = if (broadcastAvgs) broadcast(keyed) else keyed
    // `===`, not `<=>`: null group keys must NOT match, so such rows fall
    // through to `default` (reference semantics, Weather_API.py:352-358).
    val joinCond = groupKeys
      .map(k => df(k) === avgs(s"__key_$k"))
      .reduce(_ && _)
    valueCols.foldLeft(df.join(avgs, joinCond, "left")) { (acc, c) =>
        acc.withColumn(c, coalesce(col(c), col(avgCol(c)), lit(default)))
      }
      .drop(valueCols.map(avgCol) ++ groupKeys.map(k => s"__key_$k"): _*)
  }

  /** I2 — derived-value imputation (Weather_API.py:407-413):
    * `target = coalesce(target, derivation, default)` where `derivation` is
    * any expression over other columns (reference: `(min+max)/2`, guarded by
    * both inputs non-null — `coalesce` gives exactly that when the derivation
    * is null-propagating arithmetic).
    */
  def imputeDerived(
      df: DataFrame,
      target: String,
      derivation: Column,
      default: Double = 0.0): DataFrame =
    df.withColumn(target, coalesce(col(target), derivation, lit(default)))

  /** I3 — constant imputation (Weather_API.py:426,448): `na.fill` on selected
    * columns. Unlike the reference's silent type-mismatch skip (its declared
    * schema was never applied — SURVEY.md §1.2), we fill typed columns
    * directly.
    */
  def fillConstants(df: DataFrame, fills: Map[String, Any]): DataFrame =
    df.na.fill(fills)
}
