package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Error-bound tests for the approximate operators (their values are
  * engine-specific, so the oracle gate only checks rows/schema — the
  * accuracy contract lives here).
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = (0 until 5000)
    .map(i => (s"g${i % 3}", (i * 37) % 1000, i.toDouble % 97))
    .toDF("g", "k", "v")

  test("approxProfile: HLL distinct within rsd bound; quantiles within accuracy") {
    val out = Sketches.approxProfile(df, Seq("g"), "k", "v",
        quantiles = Seq(0.5), rsd = 0.05)
      .orderBy("g").collect()
    val exact = df.groupBy("g").agg(countDistinct($"k").as("d"))
      .orderBy("g").collect().map(_.getLong(1))
    out.zip(exact).foreach { case (row, ed) =>
      val ad = row.getAs[Long]("approx_distinct")
      assert(math.abs(ad - ed).toDouble / ed < 0.15,
        s"approx $ad vs exact $ed") // 3× rsd safety margin
      val med = row.getAs[Double]("p50")
      assert(med >= 0 && med <= 96)
    }
  }

  test("bloomSemiFilter: zero false negatives; FPs bounded") {
    val build = df.filter($"k" < 100).select($"k".as("bk"))
    val out = Sketches.bloomSemiFilter(
      df.select($"k").distinct(), $"k", build, $"bk", expectedItems = 1000L)
    val kept = out.as[Int].collect().toSet
    val truth = build.as[Int].collect().toSet
    assert(truth.subsetOf(kept), "bloom filters must never drop true matches")
    val universe = df.select($"k").distinct().count()
    assert(kept.size < universe, "filter should prune something")
    // FPP sanity: at 8 bits/item the false-positive rate stays low
    assert((kept.size - truth.size).toDouble / (universe - truth.size) < 0.1)
  }
}
