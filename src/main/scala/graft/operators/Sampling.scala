package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for training-data curation.
  *
  * At 100 TB a train/val/test split must be (a) reproducible across
  * reruns and engines, (b) shuffle-free — a per-row projection, never a
  * global sort or `rand()` (which changes under retries, task re-runs,
  * and partitioning), and (c) stable under corpus growth: a document's
  * split is a pure function of its id, so appending data never moves
  * existing rows between splits. The bucket is the md5 of the id (the
  * repo's portable-hash convention — DuckDB reproduces it exactly as
  * ('0x' || substr(md5(id), 1, 15))::BIGINT), reduced mod 100.
  */
object Sampling {

  /** Adds `bucket` (0-99, md5-derived) and `out` (the split name) —
    * `splits` are (name, percent) in threshold order, percents sum to
    * 100.
    */
  def deterministicSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5),
      out: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split percents must sum to 100, got $splits")
    val bucket =
      conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
        .cast("long") % 100
    val cums = splits.map(_._2).scanLeft(0)(_ + _).tail
    val assign = splits.zip(cums).init
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), cum), els) =>
          when(col("bucket") < cum, lit(name)).otherwise(els)
      }
    df.withColumn("bucket", bucket).withColumn(out, assign)
  }
}
