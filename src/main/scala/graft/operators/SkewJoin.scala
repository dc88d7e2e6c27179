package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual escape hatch for key skew that AQE's
  * skew-join split can't reach (e.g. when the skewed side feeds an
  * aggregation, or AQE is disabled).
  *
  * The big side spreads each key over `saltFactor` sub-keys
  * (deterministically, from a hash of stable row columns — no rand(), so
  * retried tasks produce identical output); the small side replicates
  * each row `saltFactor` times. A hot key's rows then land on
  * `saltFactor` tasks instead of one. Cost: small side inflates ×salt —
  * use only when the small side is genuinely small and a broadcast join
  * isn't already the answer (it usually is; salting matters when BOTH
  * sides are too big to broadcast but one has hot keys).
  */
object SkewJoin {

  /** Inner/left equi-join of `big` and `small` on `key`, salted.
    *
    * @param saltCols stable big-side columns hashed into the salt
    *                 (defaults to the key itself plus all columns via
    *                 a hash of the full row when empty)
    */
  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      joinType: String = "inner",
      saltCols: Seq[String] = Seq.empty): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    // right/full joins would emit every UNMATCHED small-side row once per
    // salt replica (saltFactor duplicates) — reject rather than corrupt
    require(Seq("inner", "left", "left_outer", "leftouter", "left_semi",
        "leftsemi", "left_anti", "leftanti", "semi", "anti")
      .contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedEquiJoin supports inner/left/semi/anti join types; " +
        s"'$joinType' would duplicate unmatched small-side rows " +
        s"$saltFactor times")
    val saltSrc: Seq[Column] =
      if (saltCols.nonEmpty) saltCols.map(col) else big.columns.map(col).toSeq
    val b = big.withColumn("__salt", pmod(xxhash64(saltSrc: _*), lit(saltFactor)))
    val s = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    b.join(s, b(key) === s(key) && b("__salt") === s("__salt"), joinType)
      .drop(s(key)).drop(b("__salt")).drop(s("__salt"))
  }
}
