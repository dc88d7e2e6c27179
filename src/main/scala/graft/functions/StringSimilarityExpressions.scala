package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity kernels for the record-linkage family. Spark ships
  * `levenshtein` but not Jaro–Winkler — the measure record linkage was
  * built on (Winkler 1990, the U.S. Census Bureau string comparator;
  * Jaro 1989): per-character agreement within a match window plus a
  * shared-prefix boost, tuned for short name-like fields where
  * levenshtein's unit costs under-weight prefix agreement.
  */
object StringSimilarityFunctions {

  /** Jaro–Winkler similarity in [0, 1]: standard Jaro (match window
    * max(|a|,|b|)/2 − 1, greedy left-to-right matching, half-counted
    * transpositions), then the Winkler boost `j + ℓ·0.1·(1−j)` for the
    * common prefix ℓ ≤ 4, applied only when jaro > 0.7 — the original
    * boost-threshold form, which is also what DuckDB implements, so the
    * oracle can replay values bit-for-bit on BMP inputs (both sides
    * compare UTF-16 code units; either side empty → 0.0).
    */
  def jaroWinkler(left: Column, right: Column): Column =
    ExpressionUtils.column(JaroWinklerExpr(
      ExpressionUtils.expression(left), ExpressionUtils.expression(right)))
}

/** See [[StringSimilarityFunctions.jaroWinkler]]. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.both(TypeChecks.string(prettyName, left.dataType),
      TypeChecks.string(prettyName, right.dataType))

  protected override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerExpr.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.JaroWinklerExpr.jw($l, $r)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {
  /** Shared by eval and generated code. One O(|a|·window) pass for the
    * match flags, one O(|a|) pass for transpositions — name-sized
    * fields, so the quadratic corner is irrelevant; the boost division
    * order mirrors the published formula literally.
    */
  def jw(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val n1 = s1.length
    val n2 = s2.length
    if (n1 == 0 || n2 == 0) return 0.0
    val window = math.max(math.max(n1, n2) / 2 - 1, 0)
    val m1 = new Array[Boolean](n1)
    val m2 = new Array[Boolean](n2)
    var m = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var j = lo
      var hit = false
      while (!hit && j <= hi) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true
          m2(j) = true
          m += 1
          hit = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched characters out of relative order, counted
    // in halves (the Jaro convention)
    var t2 = 0
    var k = 0
    i = 0
    while (i < n1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t2 += 1
        k += 1
      }
      i += 1
    }
    val t = t2 / 2.0
    val md = m.toDouble
    val jaro = (md / n1 + md / n2 + (md - t) / md) / 3.0
    if (jaro > 0.7) {
      var l4 = 0
      while (l4 < 4 && l4 < n1 && l4 < n2 && s1.charAt(l4) == s2.charAt(l4)) {
        l4 += 1
      }
      jaro + l4 * 0.1 * (1.0 - jaro)
    } else jaro
  }
}
