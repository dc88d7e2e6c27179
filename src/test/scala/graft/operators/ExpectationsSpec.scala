package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Expectations.Rule

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, 5.0, Some("a")),
    (2L, -1.0, Some("b")),   // breaches positive
    (3L, 0.0, None),         // breaches positive AND label_present;
                             // label = NULL makes length(label) NULL
    (4L, 2.0, Some("ok")))
    .toDF("id", "v", "label")

  test("check: exact counts in one scan; NULL predicates count as violations") {
    val out = Expectations.check(df, Seq(
        Rule("positive", "v > 0"),
        Rule("label_present", "label IS NOT NULL"),
        Rule("label_short", "length(label) <= 2"), // NULL for id 3
        Rule("always", "true")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(out("positive") == ((4L, 2L, false)))
    assert(out("label_present") == ((4L, 1L, false)))
    // id 3: length(NULL) = NULL -> three-valued logic would pass it;
    // the contract counts it as a breach
    assert(out("label_short") == ((4L, 1L, false)))
    assert(out("always") == ((4L, 0L, true)))
  }

  test("check: empty frame reports zero rows, passed = true, NULL frac") {
    val out = Expectations.check(df.where(lit(false)),
        Seq(Rule("positive", "v > 0"))).collect().head
    assert(out.getLong(1) == 0L && out.getLong(2) == 0L)
    assert(out.isNullAt(3) && out.getBoolean(4))
    intercept[IllegalArgumentException] {
      Expectations.check(df, Seq.empty)
    }
    intercept[IllegalArgumentException] { // duplicate names
      Expectations.check(df, Seq(Rule("x", "true"), Rule("x", "false")))
    }
  }

  test("violations: bounded lowest-id examples per rule, only breaching rules emit") {
    val big = (0L until 1000L).map(i => (i, if (i % 3 == 0) -1.0 else 1.0))
      .toDF("id", "v")
    val out = Expectations.violations(big,
        Seq(Rule("positive", "v > 0"), Rule("always", "true")),
        "id", maxExamples = 5)
      .as[(String, Long)].collect()
    assert(out.forall(_._1 == "positive"), "a passing rule must emit nothing")
    // the 5 LOWEST breaching ids: 0, 3, 6, 9, 12
    assert(out.map(_._2).sorted.toSeq == Seq(0L, 3L, 6L, 9L, 12L))
  }
}
