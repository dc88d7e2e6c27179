package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket association mining: pairwise rules with support /
  * confidence / lift (Agrawal, Imieliński & Swami, SIGMOD'93) and PMI
  * (Church & Hanks, CL'90) — the same arithmetic reads a (basket, item)
  * frame as retail orders or a (document, token) frame as corpus
  * co-occurrence, which is why this lives beside the text operators.
  *
  * Only PAIR rules: the 2-itemset lattice level is where co-occurrence
  * analytics (substitutes/complements, collocations, "also bought")
  * actually operates, and it needs no Apriori candidate loop — one
  * self-join at the basket key enumerates every pair exactly.
  *
  * Scale shape (100 TB posture):
  *  - The input reduces FIRST to distinct (basket, item) — presence
  *    semantics, the association-rule convention — so the self-join's
  *    group size is the basket's ITEM COUNT, not its row count.
  *  - Pair enumeration joins at the basket key: work is
  *    Σ C(|basket|, 2), linear in baskets for bounded basket size. A
  *    degenerate mega-basket makes that quadratic — `maxBasket` drops
  *    baskets above the cap (the q73 hot-bucket discipline: the cap is
  *    a DOCUMENTED semantic — "rules among baskets of ≤ cap items" —
  *    not a silent truncation), because a 10⁶-item basket contributes
  *    C(10⁶,2) pairs of pure noise (its presence tells nothing about
  *    item affinity) while funneling one task.
  *  - Item marginals are a small (item-cardinality) aggregate,
  *    broadcast onto the pair counts; the basket total is ONE row.
  *  - `minCount` prunes BEFORE the marginal joins, so the broadcast
  *    fan-in sees only surviving pairs.
  *
  * Determinism: every statistic ships as exact integers (counts) plus
  * derived doubles that are each ONE division/log of those integers —
  * support = c_xy/n, conf_x→y = c_xy/c_x, lift = (n·c_xy)/(c_x·c_y)
  * with both products formed in exact long arithmetic before the one
  * double division, pmi = ln(lift). No distributed float sum anywhere,
  * so any engine replaying the counts replays every derived value
  * bit-exactly — EXCEPT the log: libm `ln` is not correctly rounded
  * and JVM/DuckDB answers differ in the last ulp for some inputs
  * (observed live on this operator's gate), so pmi ships quantized to
  * 1e-6 (`pmi_q` long + the one-division double), the same escape
  * every ln-carrying operator here uses (cf. [[Graphs.adamicAdar]]). Long-range bound: n·c_xy ≤ n² — fine through n ≈ 3·10⁹
  * baskets; past that, pre-divide (the scaladoc'd migration is lift =
  * c_xy / (c_x·c_y/n), one extra rounding) — the gate stays in the
  * exact regime.
  *
  * @param baskets   input frame (any extra columns ignored)
  * @param basketCol grouping key (order id, document id, session id)
  * @param itemCol   item key (part id, token, url host)
  * @param minCount  emit only pairs co-occurring in ≥ this many baskets
  * @param maxBasket drop baskets with more than this many DISTINCT
  *                  items before pairing (None = no cap)
  * @return one row per unordered pair (item_a < item_b):
  *         (item_a, item_b, n_pair, n_a, n_b, n_baskets, support,
  *         conf_a_b, conf_b_a, lift, pmi_q, pmi)
  */
object Associations {

  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
      minCount: Long = 1L, maxBasket: Option[Int] = None): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    maxBasket.foreach(c => require(c >= 2, s"maxBasket must be >= 2, got $c"))

    val bi = baskets.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .where(col("__b").isNotNull && col("__i").isNotNull)
      .distinct()
    val kept = maxBasket match {
      case None => bi
      case Some(cap) =>
        val sizes = bi.groupBy(col("__b")).agg(count(lit(1)).as("__sz"))
          .where(col("__sz") <= cap)
          .select(col("__b"))
        bi.join(sizes, Seq("__b"), "left_semi")
    }

    // marginals over the SAME capped frame the pairs see — pair counts
    // and marginals must share a universe or lift is biased
    val nBaskets = kept.select(col("__b")).distinct()
      .agg(count(lit(1)).as("__n"))
    val itemCounts = kept.groupBy(col("__i"))
      .agg(count(lit(1)).as("__ci"))

    val pairs = kept.as("x").join(kept.as("y"),
        col("x.__b") === col("y.__b") && col("x.__i") < col("y.__i"))
      .groupBy(col("x.__i").as("item_a"), col("y.__i").as("item_b"))
      .agg(count(lit(1)).as("n_pair"))
      .where(col("n_pair") >= minCount)

    val lift = (col("__n") * col("n_pair")).cast("double") /
      (col("n_a") * col("n_b")).cast("double")
    pairs
      .join(broadcast(itemCounts).withColumnRenamed("__i", "item_a")
        .withColumnRenamed("__ci", "n_a"), Seq("item_a"))
      .join(broadcast(itemCounts).withColumnRenamed("__i", "item_b")
        .withColumnRenamed("__ci", "n_b"), Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_pair"),
        col("n_a"), col("n_b"), col("__n").as("n_baskets"),
        (col("n_pair").cast("double") / col("__n").cast("double"))
          .as("support"),
        (col("n_pair").cast("double") / col("n_a").cast("double"))
          .as("conf_a_b"),
        (col("n_pair").cast("double") / col("n_b").cast("double"))
          .as("conf_b_a"),
        lift.as("lift"),
        round(log(lift) * lit(1e6)).cast("long").as("pmi_q"))
      .withColumn("pmi", col("pmi_q").cast("double") / lit(1e6))
  }

  /** Per-item top-k affinities from a [[pairRules]] table — the
    * "customers also bought" serving artifact: every rule row fans out
    * to BOTH directions (a→b with conf_a_b, b→a with conf_b_a), and
    * each item keeps its `k` strongest partners. Strength ranks on the
    * quantized pmi (an exact long — ranking never reads a raw double),
    * ties (pmi_q desc, n_pair desc, partner asc) — fully deterministic.
    *
    * Scale shape: input is the already-reduced rule table (pair-
    * cardinality, no corpus data); the only shuffle is the rank window
    * partitioned by item, group size = the item's rule count (already
    * bounded by [[pairRules]]'s minCount/maxBasket screens).
    *
    * @return (item, partner, n_pair, confidence, lift, pmi_q, rank)
    */
  def topAffinities(rules: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val fwd = rules.select(col("item_a").as("item"),
      col("item_b").as("partner"), col("n_pair"),
      col("conf_a_b").as("confidence"), col("lift"), col("pmi_q"))
    val rev = rules.select(col("item_b").as("item"),
      col("item_a").as("partner"), col("n_pair"),
      col("conf_b_a").as("confidence"), col("lift"), col("pmi_q"))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("pmi_q").desc, col("n_pair").desc, col("partner").asc)
    fwd.unionByName(rev)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
