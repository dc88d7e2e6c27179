package graft.functions

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Textbook-value and edge gates for the Jaro–Winkler kernel. Expected
  * values are the published Winkler 1990 examples, cross-checked against
  * DuckDB's jaro_winkler_similarity (the q189 oracle compares the full
  * candidate set bit-for-bit; these pin the semantics locally).
  */
class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("x", "y")
      .select(StringSimilarityFunctions.jaroWinkler(col("x"), col("y")))
      .as[Double].collect()(0)

  test("jaroWinkler: published examples, bit-for-bit") {
    assert(jw("MARTHA", "MARHTA") == 0.9611111111111111)
    assert(jw("DIXON", "DICKSONX") == 0.8133333333333332)
    assert(jw("DWAYNE", "DUANE") == 0.8400000000000001)
    // prefix 0 → no boost even above the threshold
    assert(jw("JELLYFISH", "SMELLYFISH") == 0.8962962962962964)
    assert(jw("CRATE", "TRACE") == 0.7333333333333334)
  }

  test("jaroWinkler: edges — empty, equal, disjoint, window, threshold") {
    assert(jw("", "") == 0.0, "either side empty is 0 (DuckDB convention)")
    assert(jw("", "ABC") == 0.0 && jw("ABC", "") == 0.0)
    assert(jw("ABC", "ABC") == 1.0 && jw("a", "a") == 1.0)
    assert(jw("a", "b") == 0.0)
    // window max(2,2)/2-1 = 0: adjacent swaps can't match at all
    assert(jw("ab", "ba") == 0.0)
    // below the 0.7 boost threshold the shared prefix must NOT boost
    assert(jw("ABCDEFGH", "ABZZZZZZZZZZZZZZZZ") == 0.4537037037037037)
    // just under the threshold: 0.6969... stays unboosted
    assert(jw("AB", "ABZZZZZZZZZZZZZZZZZZZZ") == 0.6969696969696969)
    // symmetric
    assert(jw("DIXON", "DICKSONX") == jw("DICKSONX", "DIXON"))
  }

  test("jaroWinkler: planted-fixture separation the q189 gate relies on") {
    // 1-sub, 2-sub, 4-sub name perturbations: strictly graded, with the
    // 0.95 threshold between the 2-sub pair and the decoy
    val one = jw("Customer#000000003", "Customer#00000000X")
    val two = jw("Customer#000000007", "Customer#0000000XY")
    val four = jw("Customer#000000011", "Customer#00000WXYZ")
    assert(one == 0.9777777777777777 && two == 0.9555555555555556 &&
      four == 0.9111111111111111, s"grading drifted: $one $two $four")
    assert(one > two && two >= 0.95 && four < 0.95)
  }

  test("jaro_winkler: SQL surface, null propagation, type check") {
    val viaSql = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA')").as[Double].collect()(0)
    assert(viaSql == 0.9611111111111111)
    val withNull = spark.sql(
      "SELECT jaro_winkler(CAST(NULL AS STRING), 'x')")
      .collect()(0).isNullAt(0)
    assert(withNull, "null input must yield null, not a score")
    intercept[AnalysisException] {
      spark.sql("SELECT jaro_winkler(1, 'x')").collect()
    }
  }
}
