package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RFM customer segmentation (Hughes, "Strategic Database Marketing",
  * 1994 — the recency/frequency/monetary quartile-score staple): each
  * customer's purchase history reduces to three numbers, each number to
  * a 1–4 quartile score, and the three digits to a segment key
  * ("444" = best across the board).
  *
  * Scale shape (100 TB posture): the order stream reduces FIRST to one
  * row per customer (map-side-combined aggregate — the raw orders never
  * shuffle twice); the quartile cutpoints are ONE `percentile_disc`
  * aggregate row broadcast back onto the customer frame. No global rank
  * window anywhere — the classic `ntile(4) OVER ()` formulation funnels
  * every customer through one task ([[Sampling.quantilePartition]]'s
  * scaladoc'd ntile trap; this operator is that cutpoint discipline
  * specialized to the three RFM metrics).
  *
  * Determinism: monetary sums exact cents (`round(amount·100)` longs —
  * long sums are order-free); recency/frequency are integers; cutpoints
  * are `percentile_disc` — ACTUAL data values, not interpolations — and
  * band membership is `<=` against them (ties land in the lower band,
  * the [[Sampling.quantilePartition]] convention), so no float boundary
  * decides a score. Scoring direction: LOW recency is good (score 4 at
  * or below the 25th percentile), HIGH frequency/monetary are good
  * (score 4 above the 75th).
  *
  * Customers with a NULL key are dropped; NULL order dates/amounts are
  * excluded from the aggregates per SQL convention (a customer with
  * only NULL dates gets NULL recency and score 1 — the worst band —
  * surfaced, not invented).
  *
  * @param asOf the "today" anchor recency is measured back from
  *             (a date Column; pass a literal for reproducible runs)
  * @return (customer, recency_days, frequency, monetary_q, r_score,
  *         f_score, m_score, segment)
  */
object Segmentation {

  def rfmSegments(orders: DataFrame, custCol: String, dateCol: String,
      amountCol: String, asOf: Column): DataFrame = {
    val base = orders
      .where(col(custCol).isNotNull)
      .groupBy(col(custCol).as("customer"))
      .agg(
        datediff(to_date(asOf), max(to_date(col(dateCol))))
          .cast("long").as("recency_days"),
        count(lit(1)).as("frequency"),
        sum(round(col(amountCol) * lit(100.0)).cast("long"))
          .as("monetary_q"))

    val cutAggs = Seq("recency_days", "frequency", "monetary_q").flatMap {
      m => Seq(25, 50, 75).map { p =>
        expr(s"percentile_disc(CAST(0.$p AS DOUBLE)) " +
          s"WITHIN GROUP (ORDER BY $m)").as(s"__${m}_$p")
      }
    }
    val cuts = base.agg(cutAggs.head, cutAggs.tail: _*)

    def ascGood(m: String): Column = // bigger is better: 1..4 upward
      when(col(m) <= col(s"__${m}_25"), lit(1))
        .when(col(m) <= col(s"__${m}_50"), lit(2))
        .when(col(m) <= col(s"__${m}_75"), lit(3))
        .otherwise(lit(4))
    def descGood(m: String): Column = // smaller is better: 4..1 downward
      when(col(m) <= col(s"__${m}_25"), lit(4))
        .when(col(m) <= col(s"__${m}_50"), lit(3))
        .when(col(m) <= col(s"__${m}_75"), lit(2))
        .otherwise(lit(1))

    base.crossJoin(broadcast(cuts))
      .withColumn("r_score",
        when(col("recency_days").isNull, lit(1))
          .otherwise(descGood("recency_days")))
      .withColumn("f_score", ascGood("frequency"))
      .withColumn("m_score",
        when(col("monetary_q").isNull, lit(1))
          .otherwise(ascGood("monetary_q")))
      .withColumn("segment", concat(col("r_score").cast("string"),
        col("f_score").cast("string"), col("m_score").cast("string")))
      .select(col("customer"), col("recency_days"), col("frequency"),
        col("monetary_q"), col("r_score"), col("f_score"),
        col("m_score"), col("segment"))
  }
}
