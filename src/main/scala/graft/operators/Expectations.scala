package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Assertions-as-data — the Delta-expectations / dbt-tests shape: a
  * RULES list evaluated against a corpus in ONE scan, yielding a
  * per-rule violation report (and, separately, bounded per-rule example
  * rows for triage). The operational complement of the curation
  * batteries: those SCORE documents; this CONTRACTS a table ("quantity
  * is positive", "ship date present") and turns every breach into a
  * countable, diffable artifact instead of a downstream surprise.
  */
object Expectations {

  /** One expectation: `predicate` is a SQL boolean expression over the
    * checked frame's columns; a row PASSES iff it evaluates TRUE.
    * FALSE **and NULL** both count as violations — under SQL
    * three-valued logic a `WHERE NOT pred` screen silently passes
    * UNKNOWN rows, which for a data contract is exactly backwards: a
    * null where the rule expected a comparable value IS the finding.
    */
  final case class Rule(name: String, predicate: String)

  /** Per-rule violation report in ONE corpus scan: every rule becomes a
    * conditional-sum column of the SAME 1-row aggregate (no per-rule
    * passes over the data, map-side combined, shuffle = one row), which
    * then explodes into (rule, n_rows, n_violations, violation_frac,
    * passed) — one output row per rule. `violation_frac` is exact
    * int/int double division rounded at 6; an empty frame reports 0
    * rows / 0 violations with a NULL frac and passed = true (no rows,
    * no breaches).
    */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names in ${rules.map(_.name)}")
    val aggs = count(lit(1)).as("__n") +: rules.zipWithIndex.map {
      case (r, i) =>
        sum(when(coalesce(expr(r.predicate), lit(false)), 0L)
          .otherwise(1L)).as(s"__v$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("__n"), explode(array(rules.zipWithIndex.map {
        case (r, i) => struct(lit(r.name).as("rule"),
          coalesce(col(s"__v$i"), lit(0L)).as("n_violations"))
      }: _*)).as("__x"))
      .select(col("__x.rule").as("rule"), col("__n").as("n_rows"),
        col("__x.n_violations").as("n_violations"),
        when(col("__n") > 0,
          round(col("__x.n_violations").cast("double") /
            col("__n").cast("double"), 6)).as("violation_frac"),
        (col("__x.n_violations") === 0L).as("passed"))
  }

  /** Bounded per-rule violation EXAMPLES for triage — the
    * `maxExamples` lowest `idCol` values breaching each rule, via the
    * bounded-heap top-k aggregate (each map task ships ≤ maxExamples
    * ids per rule; never a window sort over the violation set). One
    * corpus scan for ALL rules: each row fans out only to the rules it
    * violates. `idCol` must be a numeric/long id (the heap's key
    * type); output is (rule, example_id) ordered ids per rule.
    */
  def violations(df: DataFrame, rules: Seq[Rule], idCol: String,
      maxExamples: Int = 10): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(maxExamples >= 1, s"maxExamples must be >= 1")
    val flags = df.select(col(idCol).cast("long").as("__id"),
      explode(array(rules.zipWithIndex.map { case (r, i) =>
        struct(lit(r.name).as("rule"),
          coalesce(expr(r.predicate), lit(false)).as("ok"))
      }: _*)).as("__x"))
    flags.where(!col("__x.ok"))
      .groupBy(col("__x.rule").as("rule"))
      .agg(graft.functions.TopKAggregate
        .topKBy(col("__id"), -col("__id").cast("double"), maxExamples)
        .as("__top"))
      .select(col("rule"),
        explode(col("__top.id")).as("example_id"))
  }
}
