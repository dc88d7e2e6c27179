package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot comparison: classify every key across two states of a table.
  *
  * The CDC companion to [[Dedup.latestVersion]]: compaction produces a
  * state per cutoff; diffing two states answers "what changed between
  * snapshot A and snapshot B" — the audit/incremental-refresh primitive a
  * crawl-refresh or feature-store pipeline runs between ingests. The
  * reference has no multi-snapshot surface (one notebook run = one state);
  * this is part of the beyond-reference CDC family (q103/q105/q106).
  */
object Snapshot {

  /** Full-outer diff of two snapshots on `keys`: one row per key present
    * in either side, with `status` ∈ added (new side only) / removed
    * (old side only) / changed (both, any payload column differs) /
    * unchanged. Payload columns (everything not in `keys`) must match by
    * name and are emitted twice, prefixed `old_` / `new_`, so the
    * consumer sees both versions of a changed row.
    *
    * Comparison is null-safe per column (`<=>`): a payload flipping
    * to/from NULL is a change, NULL on both sides is not.
    *
    * Scale: one full-outer sort-merge join, both sides shuffled once on
    * the key columns — snapshot-sized, not history-sized, and AQE
    * skew-splits a hot key. Keys must be unique per snapshot (states,
    * not logs); violations surface as row-count inflation, not silent
    * wrong answers.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs key columns")
    val payload = oldDf.columns.filterNot(keys.contains).toSeq
    require(newDf.columns.filterNot(keys.contains).toSeq == payload,
      s"snapshot schemas must match: old has $payload, new has " +
        newDf.columns.filterNot(keys.contains).toSeq)
    val o = oldDf.select(keys.map(col) ++
      payload.map(c => col(c).as(s"old_$c")) :+ lit(true).as("__o"): _*)
    val n = newDf.select(keys.map(col) ++
      payload.map(c => col(c).as(s"new_$c")) :+ lit(true).as("__n"): _*)
    val differs = payload.map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, keys, "full_outer")
      .withColumn("status",
        when(col("__o").isNull, lit("added"))
          .when(col("__n").isNull, lit("removed"))
          .when(differs, lit("changed"))
          .otherwise(lit("unchanged")))
      .drop("__o", "__n")
  }
}
