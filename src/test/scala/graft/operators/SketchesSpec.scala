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

  /** Independent HLL reference: md5 via MessageDigest, the 60-bit hash /
    * bucket / rho pipeline in plain Scala longs — no Spark expressions.
    */
  private def refRegisters(keys: Seq[String], p: Int): Map[Int, Int] = {
    val w = 60 - p
    keys.foldLeft(Map.empty[Int, Int]) { (acc, k) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val hv = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val bucket = (hv >>> w).toInt
      val tail = hv & ((1L << w) - 1L)
      val rho = if (tail == 0L) w + 1
        else w + 1 - (64 - java.lang.Long.numberOfLeadingZeros(tail))
      val reg = math.min(rho, 50)
      acc.updated(bucket, math.max(acc.getOrElse(bucket, 0), reg))
    }
  }

  test("hllRegisters ≡ independent MessageDigest reference, register for register") {
    val keys = (0 until 2000).map(i => s"k$i")
    val out = Sketches.hllRegisters(
        keys.toDF("k").withColumn("g", lit("x")), Seq("g"), $"k", p = 10)
      .select($"bucket", $"register").as[(Int, Int)].collect().toMap
    assert(out == refRegisters(keys, 10))
  }

  test("hllMerge ≡ sketch of the union, exactly (the never-rescan contract)") {
    val all = (0 until 5000).map(i => (s"g${i % 2}", s"key$i"))
    // overlapping halves: batch b re-sees a third of batch a's keys
    val a = all.filter { case (_, k) => k.hashCode % 3 != 0 }
    val b = all.filter { case (_, k) => k.hashCode % 2 == 0 }
    def sk(rows: Seq[(String, String)]) = Sketches.hllRegisters(
      rows.toDF("g", "k"), Seq("g"), $"k", p = 8)
    val merged = Sketches.hllMerge(sk(a), sk(b), Seq("g"))
      .as[(String, Int, Int)].collect().toSet
    val whole = sk(a ++ b) // one-pass sketch of the union multiset
      .as[(String, Int, Int)].collect().toSet
    assert(merged == whole)
  }

  test("hllEstimate: within 5σ of exact on large groups; linear-counting branch exact-ish on small") {
    // big group: 4000 distinct at m=1024 → σ = 1.04/32 ≈ 3.25%
    val big = (0 until 4000).map(i => ("big", s"u$i"))
    val small = (0 until 12).map(i => ("small", s"s$i"))
    val est = Sketches.hllDistinct((big ++ small).toDF("g", "k"),
        Seq("g"), $"k", p = 10)
      .select($"g", $"est_distinct", $"zero_buckets")
      .as[(String, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(math.abs(est("big")._2 - 4000.0) / 4000.0 < 5 * 1.04 / 32,
      s"big-group estimate ${est("big")._2}")
    // 12 keys in 1024 buckets: linear counting is near-exact (collision
    // chance ~6%) — and the branch must have fired (zero buckets exist)
    assert(est("small")._3 > 1000L)
    assert(math.abs(est("small")._2 - 12.0) <= 1.0,
      s"small-group estimate ${est("small")._2}")
  }

  test("hllRollingDistinct ≡ per-window recompute; edges clipped; null buckets dropped") {
    val rows = (0 until 10).flatMap(d =>
      (0 until 40).map(i => (d.toLong, s"u${d * 100 + i}"))) ++
      Seq((2L, "c"), (8L, "c")) // a key re-seen across windows
    val df = rows.toDF("day", "k").withColumn("g", lit("x"))
      .unionByName(Seq(("z")).toDF("k") // null-day row: unplaceable
        .withColumn("day", lit(null).cast("long"))
        .withColumn("g", lit("x"))
        .select($"day", $"k", $"g"))
    val out = Sketches.hllRollingDistinct(df, Seq("g"), $"k", $"day",
        window = 3, p = 8, out = "day")
      .select($"day", $"est_distinct", $"s_scaled")
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // exactly the observed days — no phantom trailing windows, no null row
    assert(out.keySet == (0L to 9L).toSet)
    // every window's merged sketch ≡ sketching that window's rows directly
    for (t <- 0L to 9L) {
      val direct = Sketches.hllDistinct(
          df.filter($"day".between(t - 2, t)), Seq("g"), $"k", p = 8)
        .select($"est_distinct", $"s_scaled").as[(Double, Long)]
        .collect().head
      assert(out(t) == direct, s"day $t: rolling ${out(t)} vs direct $direct")
    }
    // day 9's window holds 121 distinct keys (3×40 + c): linear counting
    // at m=256 lands close
    assert(math.abs(out(9L)._1 - 121.0) / 121.0 < 0.2)
    intercept[IllegalArgumentException] {
      Sketches.hllRollingDistinct(df, Seq("g"), $"k", $"day", window = 0)
    }
  }

  /** KMV reference: md5 60-bit hashes, distinct, sorted, bottom k. */
  private def refKmv(keys: Seq[String], k: Int): Seq[Long] =
    keys.map { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }.distinct.sorted.take(k)

  test("kmvSketch ≡ independent reference across partitions and duplicates") {
    val keys = (0 until 3000).map(i => s"k${i % 1000}") // 3× duplicated
    val df = keys.toDF("k").withColumn("g", lit("x")).repartition(7)
    val got = Sketches.kmvSketch(df, Seq("g"), $"k", k = 100)
      .select($"hv").as[Long].collect().sorted.toSeq
    assert(got == refKmv(keys, 100))
  }

  test("kmvMerge ≡ sketch of the union; estimate branches; overlap arithmetic") {
    val aKeys = (0 until 2000).map(i => s"u$i")
    val bKeys = (1000 until 3000).map(i => s"u$i") // 50% overlap with a
    def frame(ks: Seq[String]) =
      ks.toDF("k").withColumn("g", lit("seg"))
    def sk(ks: Seq[String], k: Int) =
      Sketches.kmvSketch(frame(ks), Seq("g"), $"k", k)
    // merge ≡ recompute, hash for hash
    val merged = Sketches.kmvMerge(sk(aKeys, 256), sk(bKeys, 256),
      Seq("g"), 256).select($"hv").as[Long].collect().sorted.toSeq
    assert(merged == refKmv(aKeys ++ bKeys, 256))
    // estimator branch: 3000 distinct in the union at k=256 —
    // σ ≈ 1/√(k−2), gate at 5σ
    val est = Sketches.kmvEstimate(
      Sketches.kmvMerge(sk(aKeys, 256), sk(bKeys, 256), Seq("g"), 256),
      Seq("g"), 256).select($"n_hashes", $"est_distinct")
      .as[(Long, Double)].collect().head
    assert(est._1 == 256L)
    assert(math.abs(est._2 - 3000.0) / 3000.0 < 5.0 / math.sqrt(254.0),
      s"union estimate ${est._2} vs 3000")
    // exact branch: fewer distinct than k → estimate IS the exact count
    val small = Sketches.kmvEstimate(sk(aKeys.take(40), 256), Seq("g"), 256)
      .select($"n_hashes", $"est_distinct").as[(Long, Double)]
      .collect().head
    assert(small == ((40L, 40.0)))
    // overlap: |A∩B| = 1000 of |A∪B| = 3000 → ρ ≈ 1/3
    val ov = Sketches.kmvOverlap(sk(aKeys, 256), sk(bKeys, 256),
      Seq("g"), 256).collect().head
    val jac = ov.getAs[Double]("jaccard_est")
    val inter = ov.getAs[Double]("est_intersection")
    assert(math.abs(jac - 1.0 / 3) < 0.15, s"jaccard $jac vs 1/3")
    assert(math.abs(inter - 1000.0) / 1000.0 < 0.45, s"intersection $inter")
    // disjoint sets: zero common samples, zero estimates, row still emitted
    val dj = Sketches.kmvOverlap(sk(aKeys.take(500), 64),
      sk((9000 until 9500).map(i => s"u$i"), 64), Seq("g"), 64)
      .collect().head
    assert(dj.getAs[Long]("n_common") == 0L)
    assert(dj.getAs[Double]("est_intersection") == 0.0)
    // exact-branch overlap: tiny sets fully sampled → exact Jaccard
    val ex = Sketches.kmvOverlap(sk(aKeys.take(30), 256),
      sk(aKeys.slice(15, 45), 256), Seq("g"), 256).collect().head
    assert(ex.getAs[Long]("n_union") == 45L)
    assert(ex.getAs[Long]("n_common") == 15L)
    assert(ex.getAs[Double]("est_intersection") == 15.0)
    assert(ex.getAs[Double]("jaccard_est") == 0.3333)
  }

  test("cmsSketch: exact at low load, overestimate-only under collisions, merge = addition") {
    // low load: 20 distinct keys in a 4×1024 grid — collisions are
    // practically impossible, every estimate must be EXACT
    val low = (0 until 200).map(i => s"k${i % 20}").toDF("k")
    val lowSk = Sketches.cmsSketch(low, Nil, $"k", depth = 4, width = 1024)
    val lowTrue = (0 until 20).map(i => s"k$i" -> 10L).toMap
    val lowEst = Sketches.cmsEstimate(lowSk,
        lowTrue.keys.toSeq.toDF("k"), "k", depth = 4, width = 1024)
      .as[(String, Long)].collect().toMap
    assert(lowEst == lowTrue)
    // crush load: 300 distinct keys into a 4×8 grid — collisions
    // everywhere; the estimate may only ever OVERcount
    val keys = (0 until 300).map(i => s"x$i")
    val heavy = keys.flatMap(k => Seq.fill(k.length)(k)).toDF("k")
    val hSk = Sketches.cmsSketch(heavy, Nil, $"k", depth = 4, width = 8)
    val est = Sketches.cmsEstimate(hSk, keys.toDF("k"), "k",
        depth = 4, width = 8)
      .as[(String, Long)].collect().toMap
    val truth = keys.map(k => k -> k.length.toLong).toMap
    assert(keys.forall(k => est(k) >= truth(k)),
      "CMS undercounted — min-of-counters broken")
    assert(keys.exists(k => est(k) > truth(k)),
      "fixture failed to collide at width 8")
    // merge ≡ sketch of the concatenation, counter for counter
    val (h1, h2) = heavy.as[String].collect().toSeq.splitAt(500)
    val merged = Sketches.cmsMerge(
        Sketches.cmsSketch(h1.toDF("k"), Nil, $"k", 4, 8),
        Sketches.cmsSketch(h2.toDF("k"), Nil, $"k", 4, 8), Nil)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == hSk.as[(Int, Long, Long)].collect().toSet)
    // unseen key against an empty sketch reads 0; nulls contribute nothing
    val empty = Sketches.cmsSketch(Seq.empty[String].toDF("k"), Nil, $"k")
    assert(Sketches.cmsEstimate(empty, Seq("ghost").toDF("k"), "k")
      .as[(String, Long)].collect().head._2 == 0L)
    val withNull = Sketches.cmsSketch(
      Seq(Some("a"), None, Some("a")).toDF("k"), Nil, $"k", 2, 16)
    assert(withNull.agg(sum($"cnt")).as[Long].collect().head == 4L) // 2 rows × depth 2
  }

  test("hllRegisters: NULL keys contribute no element; p bounds enforced") {
    val withNulls = Seq(("g", "a"), ("g", null), ("g", "b"))
      .toDF("g", "k")
    val without = Seq(("g", "a"), ("g", "b")).toDF("g", "k")
    assert(
      Sketches.hllRegisters(withNulls, Seq("g"), $"k", 8)
        .as[(String, Int, Int)].collect().toSet ==
      Sketches.hllRegisters(without, Seq("g"), $"k", 8)
        .as[(String, Int, Int)].collect().toSet)
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(without, Seq("g"), $"k", 3)
    }
    intercept[IllegalArgumentException] {
      Sketches.hllEstimate(without, Seq("g"), 13)
    }
  }

  test("hdrSketch: exact linear range, log-linear buckets, zero, guards") {
    // scale 1 keeps the hand math in integers. q < 16 buckets exactly
    // (idx = q, including ZERO); q = 100 -> e=6, idx = (6-3)*8 +
    // (100>>3) = 36
    val vals = Seq(0.0, 7.0, 7.0, 15.0, 100.0).map(("g", _))
      .toDF("g", "v")
    val sk = Sketches.hdrSketch(vals, Seq("g"), "v", scale = 1L)
      .as[(String, Long, Long)].collect()
      .map { case (_, i, n) => i -> n }.toMap
    assert(sk == Map(0L -> 1L, 7L -> 2L, 15L -> 1L, 36L -> 1L), s"$sk")
    // decode of idx 36: j=3, m=12 -> [96, 103]; the value 100 is inside
    val est = Sketches.hdrQuantiles(sk.toSeq.map { case (i, n) =>
        ("g", i, n) }.toDF("g", "idx", "n"),
        Seq("g"), Seq(1.0), scale = 1L)
      .select("idx", "lo_q", "hi_q", "est")
      .as[(Long, Long, Long, Double)].collect().head
    assert(est == ((36L, 96L, 103L, 99.5)), s"$est")
    // negative and null fail loudly; bad params rejected at build time
    intercept[Exception] {
      Sketches.hdrSketch(Seq(("g", -1.0)).toDF("g", "v"), Seq("g"), "v")
        .collect()
    }
    intercept[Exception] {
      Sketches.hdrSketch(Seq(("g", null.asInstanceOf[java.lang.Double]))
        .toDF("g", "v"), Seq("g"), "v").collect()
    }
    intercept[IllegalArgumentException] {
      Sketches.hdrSketch(vals, Seq("g"), "v", precision = 9)
    }
    intercept[IllegalArgumentException] {
      Sketches.hdrQuantiles(vals, Seq("g"), Seq(0.0))
    }
    intercept[IllegalArgumentException] {
      Sketches.hdrQuantiles(vals, Seq("g"), Nil)
    }
  }

  test("hdrSketch: merge ≡ recompute; quantile error bound on 1..1000") {
    val all = (1L to 1000L).map(v => ("g", v.toDouble)).toDF("g", "v")
    val sk = Sketches.hdrSketch(all, Seq("g"), "v", scale = 1L)
    // merge of the halves equals the whole, counter for counter
    val a = Sketches.hdrSketch(
      (1L to 500L).map(v => ("g", v.toDouble)).toDF("g", "v"),
      Seq("g"), "v", scale = 1L)
    val b = Sketches.hdrSketch(
      (501L to 1000L).map(v => ("g", v.toDouble)).toDF("g", "v"),
      Seq("g"), "v", scale = 1L)
    assert(Sketches.hdrMerge(a, b, Seq("g"))
        .as[(String, Long, Long)].collect().toSet ==
      sk.as[(String, Long, Long)].collect().toSet,
      "merge must equal the one-pass sketch bucket-for-bucket")
    // every requested quantile: the true rank statistic lies in the
    // picked bucket's [lo, hi], and the midpoint is within the 2^-(s+1)
    // relative bound (s=3 -> 1/16)
    val ps = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)
    val got = Sketches.hdrQuantiles(sk, Seq("g"), ps, scale = 1L)
      .select("p", "lo_q", "hi_q", "est")
      .as[(Double, Long, Long, Double)].collect()
    assert(got.length == ps.length)
    got.foreach { case (p, lo, hi, estV) =>
      val truth = math.ceil(p * 1000).toLong // percentile_disc on 1..1000
      assert(lo <= truth && truth <= hi, s"p=$p: $truth not in [$lo,$hi]")
      assert(math.abs(estV - truth) <= truth / 16.0 + 0.5,
        s"p=$p: est $estV vs $truth")
    }
  }
}
