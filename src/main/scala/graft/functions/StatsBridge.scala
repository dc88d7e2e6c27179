/* Bridge into Spark's checkpoint statistics internals.
 *
 * `Dataset.checkpoint`/`localCheckpoint` carry the ORIGIN plan's
 * Statistics into the truncated LogicalRDD (so a small checkpointed
 * build side stays broadcastable — behavior we rely on). But
 * sizeInBytes estimation multiplies across join children, so an
 * ITERATIVE operator that self-joins its round frame SQUARES the
 * estimate every round: after k checkpointed rounds the BigInt carries
 * ~2^k × the initial bit length, and from roughly round 20 the driver
 * spends its time in BigInteger.multiply (Toom-Cook) inside
 * JoinSelection.canBroadcastBySize — PLANNING becomes the bottleneck,
 * invisibly at gate scale and fatally at sf0.1 (observed: q230's inner
 * connectedComponents pinned one core for 75+ minutes in stats
 * estimation while every executor sat idle).
 *
 * The fix is a clamp, not a reset: estimates that fit in a long pass
 * through bit-identical (broadcast decisions unchanged — the only
 * consumers compare against thresholds ≤ a few GB), and anything wider
 * clamps to Long.MaxValue ("not broadcastable", which such an estimate
 * already meant). Since every staged round re-enters through this
 * clamp, the carried size is ≤ 64 bits forever and the per-round
 * squaring is bounded at ~128 bits of intermediate product.
 *
 * Lives in the sql package namespace for the same reason as
 * ColumnBridge: LogicalRDD's second constructor parameter list and
 * classic.Dataset.ofRows are private[sql].
 */
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

object StatsBridge {

  private val MaxCarried = BigInt(Long.MaxValue)

  /** Clamp the origin statistics a checkpoint carried into its
    * LogicalRDD (see the file header). No-op (same frame back) when
    * the plan is not a LogicalRDD or its estimate already fits in a
    * long.
    */
  def clampCheckpointStats(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[Dataset[Row]]
    classic.logicalPlan match {
      case lr: LogicalRDD if lr.stats.sizeInBytes > MaxCarried =>
        val spark = classic.sparkSession.asInstanceOf[SparkSession]
        val clamped = Statistics(
          sizeInBytes = MaxCarried,
          rowCount = lr.stats.rowCount.map(_.min(MaxCarried)))
        // Constraints carry through unchanged: `lr.constraints` is the
        // origin set already rebased onto this plan's output (and
        // filtered to deterministic expressions — re-filtering is
        // idempotent), so a frame whose size estimate overflowed keeps
        // its inferred not-nulls instead of losing them with the clamp.
        Dataset.ofRows(spark,
          new LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            spark, Some(clamped), Some(lr.constraints)))
      case _ => df
    }
  }
}
