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

  test("approxProfile at the q46 gate fixture: HLL within rsd, quantiles within rank accuracy") {
    // q46 is rows-only at the driver gate (sketch values are engine-
    // specific) — the accuracy contract is enforced HERE, on the same
    // events table and configuration the gate runs: HLL++ distinct
    // within 3x rsd of exact, and each percentile_approx cutpoint's
    // RANK within 2 x n/accuracy of its target rank (the documented
    // percentile_approx guarantee is n/accuracy).
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val ev = graft.sources.Tables.events(spark, dir)
      .select($"event_type", $"user_id", $"value").cache()
    try {
      val prof = Sketches.approxProfile(ev, Seq("event_type"),
          "user_id", "value")
        .collect().map(r => r.getAs[String]("event_type") -> r).toMap
      val exact = ev.groupBy("event_type")
        .agg(countDistinct($"user_id").as("d"),
          count(when($"value".isNotNull, 1)).as("n"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      assert(exact.nonEmpty && exact.keySet == prof.keySet)
      exact.foreach { case (g, (d, n)) =>
        val ad = prof(g).getAs[Long]("approx_distinct")
        assert(math.abs(ad - d).toDouble / d <= 0.15,
          s"$g: HLL $ad vs exact $d exceeds 3x rsd=0.05")
        for ((q, cname) <- Seq(0.5 -> "p50", 0.95 -> "p95")) {
          val cut = prof(g).getAs[Double](cname)
          val atOrBelow = ev.filter($"event_type" === g &&
            $"value" <= cut).count()
          val strictlyBelow = ev.filter($"event_type" === g &&
            $"value" < cut).count()
          val bound = math.max(2.0 * n / 10000, 1.0)
          assert(atOrBelow >= q * n - bound,
            s"$g $cname=$cut ranks $atOrBelow of $n — below rank bound")
          assert(strictlyBelow <= q * n + bound,
            s"$g $cname=$cut ranks $strictlyBelow of $n — above rank bound")
        }
      }
    } finally ev.unpersist()
  }

  test("approxQuantileBuckets: ordered, near-uniform, deterministic, no global sort") {
    val out = Sketches.approxQuantileBuckets(df, "v", 4)
    val rows = out.select($"v", $"bucket").as[(Double, Int)].collect()
    // order-consistent: a higher value never lands in a lower bucket
    val maxPerBucket = rows.groupBy(_._2).view.mapValues(_.map(_._1).max)
    (1 to 3).foreach { b =>
      assert(maxPerBucket(b) <= rows.filter(_._2 == b + 1).map(_._1).min)
    }
    // near-uniform populations (exact quartiles would be 1250 each)
    val sizes = rows.groupBy(_._2).view.mapValues(_.size)
    (1 to 4).foreach(b => assert(sizes(b) > 1000 && sizes(b) < 1500,
      s"bucket $b size ${sizes(b)}"))
    // deterministic across runs
    val again = Sketches.approxQuantileBuckets(df, "v", 4)
      .select($"v", $"bucket").as[(Double, Int)].collect()
    assert(rows.sorted.toSeq == again.sorted.toSeq)
    // the assignment plan is scan-only — no exchange, no sort
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Sort"),
      s"bucket assignment must be a per-row projection:\n$plan")
  }

  test("approxQuantileBuckets: null values get null buckets; empty and int inputs survive") {
    // nulls are unrankable → null bucket (documented divergence from
    // ntile's nulls-first), and they must not perturb the cutpoints
    val withNulls = Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0, null, null)
      .toDF("v")
    val out = Sketches.approxQuantileBuckets(withNulls, "v", 2)
      .select($"v", $"bucket").collect()
    out.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1), "null value → null bucket")
      else assert(!r.isNullAt(1))
    }
    // empty input: sketch row is NULL — must not NPE
    val empty = Sketches.approxQuantileBuckets(
      withNulls.filter($"v" > 100), "v", 3)
    assert(empty.count() == 0)
    // all-null input: same guard, rows survive with null buckets
    val allNull = Sketches.approxQuantileBuckets(
      withNulls.filter($"v".isNull), "v", 3)
    assert(allNull.count() == 2 && allNull.filter($"bucket".isNull).count() == 2)
    // integer-typed value column (the q75 gate shape) buckets fine
    val ints = Sketches.approxQuantileBuckets(
      (1 to 100).toDF("n"), "n", 4)
    assert(ints.filter($"bucket".between(1, 4)).count() == 100)
  }

  test("approxQuantileBuckets exact mode: percentile_disc cutpoints, known fixture") {
    // buckets=2 over 1..10: the p50 disc cutpoint is 5 (smallest value
    // with cume_dist >= 0.5), so 1..5 → bucket 1 and 6..10 → bucket 2 —
    // the exact boundary the q75 value oracle hash-checks.
    val out = Sketches.approxQuantileBuckets((1 to 10).toDF("n"), "n", 2,
        exact = true)
      .select($"n", $"bucket").as[(Int, Int)].collect().toMap
    (1 to 5).foreach(n => assert(out(n) == 1, s"n=$n"))
    (6 to 10).foreach(n => assert(out(n) == 2, s"n=$n"))
    // exact and approx modes agree when the sketch is error-free (tiny
    // input, accuracy >> n): the when-chain assignment is shared code
    val big = (1 to 1000).toDF("n")
    val ex = Sketches.approxQuantileBuckets(big, "n", 10, exact = true)
      .select($"n", $"bucket").as[(Int, Int)].collect().toMap
    val ap = Sketches.approxQuantileBuckets(big, "n", 10)
      .select($"n", $"bucket").as[(Int, Int)].collect().toMap
    assert(ex == ap)
    // null/empty guards hold in exact mode too
    val allNull = Sketches.approxQuantileBuckets(
      Seq[java.lang.Double](null, null).toDF("v"), "v", 3, exact = true)
    assert(allNull.count() == 2 && allNull.filter($"bucket".isNull).count() == 2)
  }

  test("exactHeavyHitters ≡ brute-force full aggregation") {
    // skewed synthetic: value v appears ~1000/(v+1) times
    val rows = (0 until 200).flatMap(v => Seq.fill(1000 / (v + 1))(v))
    val skew = rows.toDF("v")
    val out = Sketches.exactHeavyHitters(skew, "v", support = 0.02)
      .as[(Int, Long)].collect().toMap
    val n = rows.size
    val brute = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c.toDouble > 0.02 * n }.toMap
    assert(out == brute)
    assert(out.nonEmpty && out.size < 20) // sketch path actually prunes
  }

  test("profileError artifact (q115 gate config): HLL within 3x rsd, cutpoint ranks within discreteness bound") {
    // The q115 gate artifact's CONTRACT: at the exact q46/q115
    // configuration, every group's HLL relative error stays within 3x
    // rsd and every sketch cutpoint's rank epsilon within
    // max(2/accuracy, 2/n) — 2/n is rank discreteness: the target rank
    // q*n can fall between two achievable value-ranks.
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val rows = Sketches.profileError(graft.sources.Tables.events(spark, dir),
      Seq("event_type"), "user_id", "value").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[String]("event_type")
      assert(r.getAs[Double]("hll_rel_err") <= 0.15,
        s"$g: hll_rel_err ${r.getAs[Double]("hll_rel_err")} > 3x rsd")
      val n = r.getAs[Long]("n_values")
      val bound = math.max(2.0 / 10000, 2.0 / n)
      for (c <- Seq("rank_eps_p50", "rank_eps_p95")) {
        assert(r.getAs[Double](c) <= bound,
          s"$g: $c ${r.getAs[Double](c)} > $bound")
      }
    }
  }

  test("profileError: artificially broken accuracy trips the rank measurement") {
    // Same fixture, accuracy 10 instead of 10000: the measured rank
    // epsilon must blow far past the gate bound — the artifact is a
    // tripwire, not a formality.
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val rows = Sketches.profileError(graft.sources.Tables.events(spark, dir),
      Seq("event_type"), "user_id", "value", accuracy = 10).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("rank_eps_p50") > 0.01,
        s"broken accuracy must be detected, got ${r.getAs[Double]("rank_eps_p50")}")
    }
  }

  test("profileError: artificially broken rsd trips the HLL measurement") {
    // 10k distinct keys per group at rsd=0.3 (a 16-register sketch):
    // at least one group's measured relative error exceeds the gate's
    // 3x-rsd=0.05 bound (deterministic — HLL++ is seed-free).
    val syn = (0 until 20000)
      .map(i => (s"g${i % 2}", i, i.toDouble % 97)).toDF("g", "k", "v")
    val errs = Sketches.profileError(syn, Seq("g"), "k", "v", rsd = 0.3)
      .collect().map(_.getAs[Double]("hll_rel_err"))
    assert(errs.exists(_ > 0.15),
      s"broken rsd must be detected, got ${errs.mkString(",")}")
  }

  test("profileError: all-null value group yields null epsilons, no blow-up") {
    val df2 = Seq(("a", 1, Some(1.0)), ("a", 2, Some(2.0)),
      ("b", 3, None: Option[Double])).toDF("g", "k", "v")
    val out = Sketches.profileError(df2, Seq("g"), "k", "v",
        quantiles = Seq(0.5)).collect()
      .map(r => r.getAs[String]("g") -> r).toMap
    assert(out("a").getAs[Double]("hll_rel_err") == 0.0)
    assert(out("b").getAs[Long]("n_values") == 0L)
    assert(out("b").isNullAt(out("b").fieldIndex("rank_eps_p50")))
  }

  test("bloomFppAudit (q116 gate config): zero false negatives, observed fpp within 2x design") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/orders.parquet").exists())
    val hot = graft.sources.Tables.orders(spark, dir)
      .filter($"o_totalprice" > 400000.0)
    val r = Sketches.bloomFppAudit(
      graft.sources.Tables.customer(spark, dir)
        .select("c_custkey", "c_name"), $"c_custkey",
      hot.select("o_custkey"), $"o_custkey").collect()(0)
    assert(r.getAs[Long]("false_negatives") == 0L,
      "bloom filters must never drop true matches")
    assert(r.getAs[Long]("bloom_pass") ==
      r.getAs[Long]("true_matches") + r.getAs[Long]("false_positives"))
    assert(r.getAs[Double]("observed_fpp") <=
      2.0 * r.getAs[Double]("design_fpp"),
      s"observed ${r.getAs[Double]("observed_fpp")} vs design " +
        s"${r.getAs[Double]("design_fpp")}")
  }

  test("bloomFppAudit: undersized sketch trips the FPP measurement") {
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/orders.parquet").exists())
    val hot = graft.sources.Tables.orders(spark, dir)
      .filter($"o_totalprice" > 400000.0)
    val r = Sketches.bloomFppAudit(
      graft.sources.Tables.customer(spark, dir)
        .select("c_custkey", "c_name"), $"c_custkey",
      hot.select("o_custkey"), $"o_custkey", expectedItems = 8L)
      .collect()(0)
    assert(r.getAs[Long]("false_negatives") == 0L)
    assert(r.getAs[Double]("observed_fpp") >
      2.0 * r.getAs[Double]("design_fpp"),
      "a saturated sketch must be detected")
  }

  test("bloomFppAudit: null probe keys are reported, excluded from FPP") {
    // ADVICE r8: a null key can never be a true match (its xxhash64
    // degenerates to the seed) — it must not inflate the denominator
    val build = (0 until 100).map(i => i * 2).toDF("bk")
    val probe = ((0 until 200).map(i => Option(i)) ++
      Seq.fill(50)(None: Option[Int])).toDF("pk")
    val r = Sketches.bloomFppAudit(probe, $"pk", build, $"bk",
      expectedItems = 1000L).collect()(0)
    assert(r.getAs[Long]("probe_rows") == 250L)
    assert(r.getAs[Long]("null_probes") == 50L)
    assert(r.getAs[Long]("true_matches") == 100L)
    assert(r.getAs[Long]("false_negatives") == 0L)
    // denominator = 250 − 50 nulls − 100 matches = 100 non-matching probes
    assert(r.getAs[Double]("observed_fpp") ==
      r.getAs[Long]("false_positives").toDouble / 100.0)
    // null probes never count as bloom-positive
    assert(r.getAs[Long]("bloom_pass") ==
      r.getAs[Long]("true_matches") + r.getAs[Long]("false_positives"))
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
