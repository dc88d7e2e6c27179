package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed range (interval-containment) join: pair every point with
  * every interval containing it (`start <= point <= end`), with NO equi
  * key — the case Spark's planner turns into a broadcast nested-loop (or
  * cartesian) join, which dies at scale.
  *
  * Scale design — interval bucketing, the standard fix: quantize the
  * range axis into `bucketSize`-wide buckets; points land in exactly one
  * bucket, intervals replicate to each bucket they overlap
  * (`explode(sequence(...))`), and the join becomes an EQUI join on the
  * bucket id followed by the exact containment filter. Work is
  * candidates-per-bucket, not |points| × |intervals|; interval
  * replication is `len/bucketSize + 1`, so pick `bucketSize` near the
  * typical interval length (replication ~2 while buckets stay
  * selective). Degenerate long intervals fan out proportionally — cap or
  * split them upstream on real data.
  */
object RangeJoin {

  /** @param points     one row per point; all columns survive
    * @param intervals  one row per interval; all columns survive
    * @param pointCol   numeric point column (e.g. epoch seconds)
    * @param startCol   numeric interval start (inclusive), on `intervals`
    * @param endCol     numeric interval end (inclusive), on `intervals`
    * @param bucketSize bucket width in the same units
    * @return inner-join pairs: columns of both inputs (names must not
    *         collide), containment-exact
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketSize: Long): DataFrame = {
    require(bucketSize > 0, s"bucketSize must be positive, got $bucketSize")
    val clash = points.columns.toSet.intersect(intervals.columns.toSet)
    require(clash.isEmpty, s"point/interval column names collide: $clash")
    // Bucket id = floor division. For integral axes this must be INTEGER
    // arithmetic: `/` is double division, and above 2^53 (epoch
    // nanoseconds ≈ 1.7e18) the rounding can push a point's bucket across
    // an edge its interval's replication never crosses — a silent false
    // negative. floor-div with sign correction (`div` truncates toward
    // zero); fractional axes keep the double floor path.
    def bucketOf(df: DataFrame, c: String): Column = {
      val integral = df.schema(c).dataType.simpleString match {
        case "bigint" | "int" | "smallint" | "tinyint" => true
        case _ => false
      }
      if (integral)
        expr(s"(($c - pmod($c, ${bucketSize}L)) div ${bucketSize}L)")
      else floor(col(c) / bucketSize).cast("long")
    }
    val pb = points.withColumn("__b", bucketOf(points, pointCol))
    val ib = intervals.withColumn("__b", explode(sequence(
      bucketOf(intervals, startCol), bucketOf(intervals, endCol))))
    pb.join(ib, Seq("__b"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__b")
  }
}
