package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-operator helpers and their skew-hardened variants (VERDICT r1
  * "next round" #8).
  *
  * A plain `Window.partitionBy(entity)` sends every row of one entity to
  * one task. At 100 TB a hot entity (a bot user, a default key) turns
  * into a straggler or an OOM. [[saltedRollingAvg]] is the documented
  * escape hatch: chunk each entity's series into fixed-size salted
  * sub-partitions, compute the frame inside each chunk, and patch the
  * first `frame-1` rows of every chunk (whose frames cross the chunk
  * boundary) with a bounded self-join on the previous chunk's tail. Both
  * shuffles key on (entity, chunk) — max task size is the chunk size, not
  * the entity size.
  */
object Windows {

  /** Rolling average over the last `frame` rows per entity (plain
    * windowed form — the baseline the salted variant must match).
    */
  def rollingAvg(df: DataFrame, entity: String, order: Seq[Column],
      value: String, frame: Int, out: String): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(order: _*)
      .rowsBetween(-(frame - 1), 0)
    df.withColumn(out, avg(col(value)).over(w))
  }

  /** Batch sessionization: per-entity session index (1-based) that
    * increments whenever the gap between consecutive rows exceeds
    * `maxGap` (same semantics as the streaming
    * `Streaming.sessionize` family, expressed relationally: a lag to
    * measure the gap, then a running sum over the session-start flag).
    * Both windows share one (entity)-keyed shuffle + sort; the skew
    * exposure and its remedy are the same as [[rollingAvg]]'s.
    */
  def sessionize(df: DataFrame, entity: String, order: Seq[Column],
      timeCol: String, maxGap: Long, out: String = "session_idx"): DataFrame = {
    val w = Window.partitionBy(col(entity)).orderBy(order: _*)
    val gap = col(timeCol) - lag(col(timeCol), 1).over(w)
    val isNew = when(gap.isNull || gap > maxGap, 1L).otherwise(0L)
    df.withColumn(out, sum(isNew).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Skew-hardened rolling average, equivalent to [[rollingAvg]] for any
    * `chunkSize >= frame`.
    *
    * Phase 1: rows get a global per-entity row number — this is the one
    * step that still windows by entity alone, but on a PROJECTION of
    * (entity, order-key) only, so the straggler task sorts narrow rows
    * (in a production pipeline this rank often already exists as an
    * ingest sequence number; pass it via `rowNumCol` to skip the phase).
    * Phase 2: rows shuffle by (entity, rowNum / chunkSize); each chunk
    * computes frames locally. Phase 3: every chunk's first `frame-1`
    * rows recompute their frame from the previous chunk's tail, shipped
    * via a bounded (entity, chunk)-keyed self-join — tail size is
    * `frame-1` rows per chunk, independent of entity skew.
    */
  def saltedRollingAvg(df: DataFrame, entity: String, order: Seq[Column],
      value: String, frame: Int, out: String,
      chunkSize: Int = 10000): DataFrame = {
    require(chunkSize >= frame, s"chunkSize=$chunkSize must be >= frame=$frame")
    val rn = Window.partitionBy(col(entity)).orderBy(order: _*)
    val numbered = df
      .withColumn("__rn", row_number().over(rn))
      .withColumn("__chunk", (col("__rn") - 1) divide chunkSize cast "long")
      .withColumn("__pos", (col("__rn") - 1) % chunkSize)

    // Local frames inside each (entity, chunk).
    val wLocal = Window.partitionBy(col(entity), col("__chunk"))
      .orderBy(col("__pos")).rowsBetween(-(frame - 1), 0)
    val local = numbered
      .withColumn("__localAvg", avg(col(value)).over(wLocal))
      .withColumn("__localSum", sum(col(value)).over(wLocal))
      .withColumn("__localCnt", count(col(value)).over(wLocal))

    // Tail of each chunk: the last frame-1 rows, shipped to the NEXT
    // chunk. Bounded: frame-1 rows per chunk regardless of skew.
    val tails = numbered
      .filter(col("__pos") >= chunkSize - (frame - 1))
      .select(col(entity).as("__t_entity"),
        (col("__chunk") + 1).as("__t_chunk"),
        col("__pos").as("__t_pos"), col(value).as("__t_v"))

    // Boundary rows (__pos < frame-1, chunk > 0): extend their frame with
    // tail rows whose position is within `frame` rows before them.
    val boundary = local.filter(col("__pos") < frame - 1 && col("__chunk") > 0)
      .join(tails,
        col(entity) === col("__t_entity") &&
          col("__chunk") === col("__t_chunk") &&
          col("__t_pos") >= col("__pos") + chunkSize - (frame - 1), "left")
      .groupBy((numbered.columns.map(col) :+ col("__localSum") :+
        col("__localCnt")): _*)
      .agg(sum(col("__t_v")).as("__tailSum"),
        count(col("__t_v")).as("__tailCnt"))
      .withColumn(out,
        // both partial sums need the null→0 coalesce (an all-null local
        // window yields a NULL sum that would poison the average), and a
        // zero combined count must yield NULL — exactly what the plain
        // window's avg() returns over an all-null frame
        when(col("__localCnt") + col("__tailCnt") > 0,
          (coalesce(col("__localSum"), lit(0.0)) +
            coalesce(col("__tailSum"), lit(0.0))) /
            (col("__localCnt") + col("__tailCnt"))))

    val interior = local
      .filter(col("__pos") >= frame - 1 || col("__chunk") === 0)
      .withColumn(out, col("__localAvg"))

    val cols = df.columns.map(col) :+ col(out)
    interior.select(cols: _*).unionByName(boundary.select(cols: _*))
  }
}
