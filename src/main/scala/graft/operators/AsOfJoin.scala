package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every probe row, attach the payload of the
  * most recent build row with `build.time <= probe.time` in the same key
  * group (left semantics — probe rows with no prior build row keep null
  * payload). The attribution / point-in-time-lookup primitive (latest
  * price at trade time, last purchase before a click).
  *
  * Scale design: Spark has no native as-of join, and the naive
  * formulations don't survive 100 TB — an equi-join on key + `t_b <= t_p`
  * range filter replicates every probe row across ALL its key's build
  * rows before filtering (quadratic per key), and a per-probe correlated
  * top-1 subquery is a join per row. This implementation is the
  * union-tag + running-window shape instead: tag both sides, union, and
  * take `last(payload, ignoreNulls)` over one (key)-partitioned window
  * ordered by (time, tag) — ONE shuffle of (key, time, payload) rows
  * total, no replication, build rows sort before probe rows at equal
  * times so the boundary is inclusive. Skew note: a hot key still lands
  * in one task (the same exposure as any per-entity window —
  * [[Windows.saltedRollingAvg]]'s chunking applies if that ever bites).
  */
object AsOfJoin {

  /** @param probe       left side; all its columns survive
    * @param build       right side; only `keyCol`, `timeCol`, payload move
    * @param keyCol      equi-join key, same name both sides
    * @param timeCol     ordering column, same name and comparable type
    *                    both sides. (key, time) should be unique on the
    *                    build side — among equal-time build rows the
    *                    window keeps an arbitrary one
    * @param payloadCols build columns to attach (must not collide with
    *                    probe column names)
    */
  def asOfBackward(probe: DataFrame, build: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String]): DataFrame = {
    val clash = probe.columns.toSet.intersect(payloadCols.toSet)
    require(clash.isEmpty, s"payload collides with probe columns: $clash")

    val probeRow = struct(probe.columns.map(col): _*)
    val probeRowType = probe.select(probeRow.as("r")).schema("r").dataType
    val payload = struct(payloadCols.map(col): _*)
    val payloadType = build.select(payload.as("p")).schema("p").dataType

    // A build row with a NULL time can never satisfy t_b <= t_p, but
    // nulls sort FIRST ascending, so unfiltered it would sit at the top
    // of every key's window and fabricate a match for every probe row.
    val b = build.filter(col(timeCol).isNotNull)
      .select(col(keyCol).as("__k"), col(timeCol).as("__t"),
        lit(0).as("__tag"), payload.as("__p"),
        lit(null).cast(probeRowType).as("__row"))
    val p = probe.select(col(keyCol).as("__k"), col(timeCol).as("__t"),
      lit(1).as("__tag"), lit(null).cast(payloadType).as("__p"),
      probeRow.as("__row"))

    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.unionByName(p)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(probe.columns.map(c => col(s"__row.$c").as(c)) ++
        payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** [[asOfBackward]] with a staleness bound — the attribution-window
    * form (a click attributes to the last purchase only if it happened
    * within `tolerance`; an as-of price is only valid so long): the
    * most recent prior build row still wins, but when it is older than
    * `tolerance` time units the payload is nulled, exactly as if no
    * build row existed. Since the most recent prior row IS the nearest
    * prior row, "nearest within tolerance" and "most recent, bounded"
    * coincide — no second pass needed.
    *
    * `timeCol` must be NUMERIC (epoch ns/µs/s — the [[graft.sources
    * .Tables]] `ts_ns` convention) so the staleness test is plain long
    * arithmetic inside the same single-shuffle plan; the matched build
    * time rides the window struct, so the bound costs zero extra
    * shuffles or joins.
    */
  def asOfBackwardWithin(probe: DataFrame, build: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String],
      tolerance: Long): DataFrame = {
    require(tolerance >= 0, s"tolerance must be >= 0, got $tolerance")
    val clash = probe.columns.toSet.intersect(payloadCols.toSet)
    require(clash.isEmpty, s"payload collides with probe columns: $clash")

    val probeRow = struct(probe.columns.map(col): _*)
    val probeRowType = probe.select(probeRow.as("r")).schema("r").dataType
    // matched build TIME rides the window payload so the staleness test
    // is a per-row projection after the one window pass
    val payload = struct(col(timeCol).as("__bt") +:
      payloadCols.map(col): _*)
    val payloadType = build.select(payload.as("p")).schema("p").dataType

    val b = build.filter(col(timeCol).isNotNull)
      .select(col(keyCol).as("__k"), col(timeCol).as("__t"),
        lit(0).as("__tag"), payload.as("__p"),
        lit(null).cast(probeRowType).as("__row"))
    val p = probe.select(col(keyCol).as("__k"), col(timeCol).as("__t"),
      lit(1).as("__tag"), lit(null).cast(payloadType).as("__p"),
      probeRow.as("__row"))

    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fresh = col("__m").isNotNull &&
      (col("__t") - col("__m.__bt") <= tolerance)
    b.unionByName(p)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(probe.columns.map(c => col(s"__row.$c").as(c)) ++
        payloadCols.map(c =>
          when(fresh, col(s"__m.$c")).as(c)): _*)
  }
}
