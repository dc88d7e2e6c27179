package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** I1-I3 semantics (SURVEY.md §2.9; reference Weather_API.py:341-448),
  * including the multi-key null-key fall-through the oracle gate can't
  * reach with never-null keys (VERDICT r1 J2).
  */
class ImputationSpec extends SparkSpec {
  import spark.implicits._

  test("I1: non-null values are kept verbatim") {
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0))).toDF("k", "v")
    val out = Imputation.imputeByGroupAvg(df, "v", Seq("k"))
      .select("v").as[Double].collect().sorted
    assert(out.toSeq == Seq(1.0, 3.0))
  }

  test("I1: null value takes the group average") {
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("a", None))
      .toDF("k", "v")
    val out = Imputation.imputeByGroupAvg(df, "v", Seq("k"))
      .select("v").as[Double].collect().sorted
    assert(out.toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("I1: all-null group falls through to the default") {
    val df = Seq(("a", None: Option[Double]), ("a", None)).toDF("k", "v")
    val out = Imputation.imputeByGroupAvg(df, "v", Seq("k"), default = -9.0)
      .select("v").as[Double].collect()
    assert(out.toSeq == Seq(-9.0, -9.0))
  }

  test("I1: null group key never matches the join (=== not <=>) → default") {
    // Reference semantics Weather_API.py:352-358: rows with null keys do
    // not inherit any group's average, even though the aggregate side has
    // a null-key group row.
    val df = Seq(
      (Some("a"), Some(1), Some(10.0)),
      (Some("a"), Some(1), None), // → 10.0 (group avg)
      (None, Some(1), None), // null k1 → 0.0
      (Some("a"), None, None) // null k2 → 0.0
    ).toDF("k1", "k2", "v")
    val out = Imputation.imputeByGroupAvg(df, "v", Seq("k1", "k2"))
      .orderBy($"k1".asc_nulls_last, $"k2".asc_nulls_last)
      .select("v").as[Double].collect()
    assert(out.toSeq == Seq(10.0, 10.0, 0.0, 0.0))
  }

  test("I1 multi-column: one agg+join imputes both columns") {
    val df = Seq(
      ("a", Some(2.0), Some(100.0)),
      ("a", None, None),
      ("b", None, Some(50.0))
    ).toDF("k", "x", "y")
    val out = Imputation.imputeByGroupAvg(df, Seq("x", "y"), Seq("k"),
        default = -1.0, broadcastAvgs = true)
      .orderBy("k", "x").select($"x", $"y").as[(Double, Double)].collect()
    assert(out.toSeq == Seq((2.0, 100.0), (2.0, 100.0), (-1.0, 50.0)))
  }

  test("I2: derivation arm requires all inputs non-null, else default") {
    val df = Seq(
      (Some(5.0), Some(1.0), Some(3.0)), // target present → kept
      (None, Some(1.0), Some(3.0)), // → (1+3)/2 = 2.0
      (None, Some(1.0), None), // derivation null → 0.0
      (None, None, None) // → 0.0
    ).toDF("t", "lo", "hi")
    val out = Imputation.imputeDerived(df, "t", ($"lo" + $"hi") / 2)
      .select("t").as[Double].collect()
    assert(out.toSeq == Seq(5.0, 2.0, 0.0, 0.0))
  }

  test("I3: constant fill is typed per column") {
    val df = Seq((Some(1.5), Some("x")), (None, None))
      .toDF("num", "str")
    val out = Imputation.fillConstants(df,
        Map("num" -> 0.0, "str" -> "missing"))
      .orderBy($"num")
      .as[(Double, String)].collect()
    assert(out.toSeq == Seq((0.0, "missing"), (1.5, "x")))
  }
}
