package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003): polynomial rolling-style hashes of every k-char-gram, then the
  * minimum per sliding window of w consecutive gram hashes, de-duplicated
  * and sorted. Unlike a whole-document hash (q33), the fingerprint SET
  * survives partial edits — two documents sharing any run of at least
  * w+k-1 characters share at least one fingerprint, which is what makes
  * this the standard primitive for partial-overlap / clone detection.
  *
  * Engine-portability: the gram hash is Σ cp·B^(k-1-t) mod M over code
  * points (B=257, M=2^31−1), chosen so a SQL oracle reproduces it with
  * checked BIGINT arithmetic (every intermediate < 2^55). The output is
  * the distinct minima SET, so the winnowing tie-break rule (which
  * occurrence a window selects) cannot affect the value. One pass per
  * row, codegen'd, no shuffle.
  */
object WinnowFunctions {
  /** Sorted distinct winnowing fingerprints (array<long>). */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    ExpressionUtils.column(
      WinnowExpr(ExpressionUtils.expression(text), k, w))
}

/** See [[WinnowFunctions.winnowFingerprints]]. */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1, s"winnow_fingerprints k must be >= 1, got $k")
  require(w >= 1,
    s"winnow_fingerprints w must be >= 1 (w <= 0 would emit the " +
      s"Long.MaxValue sentinel for every document), got $w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprints"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.string(prettyName, child.dataType)

  protected override def nullSafeEval(input: Any): Any =
    WinnowExpr.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowExpr.fingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowExpr {
  val Base = 257L
  val Mod = 2147483647L // 2^31 - 1; cp·B^t stays < 2^55 — oracle-safe

  /** Shared by eval and generated code (static forwarder). */
  def fingerprints(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    // decode code points once, linearly
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val cps = new Array[Int](n)
    var i = 0
    var ci = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      cps(i) = cp
      i += 1
      ci += Character.charCount(cp)
    }
    val kk = math.min(k, n)
    val nHashes = n - kk + 1
    val hashes = new Array[Long](nHashes)
    var j = 0
    while (j < nHashes) {
      var h = 0L
      var t = 0
      while (t < kk) {
        h = (h * Base + cps(j + t)) % Mod
        t += 1
      }
      hashes(j) = h
      j += 1
    }
    val mins =
      if (nHashes <= w) Array(hashes.min)
      else {
        val out = new Array[Long](nHashes - w + 1)
        var p = 0
        while (p <= nHashes - w) {
          var m = Long.MaxValue
          var q = p
          while (q < p + w) {
            if (hashes(q) < m) m = hashes(q)
            q += 1
          }
          out(p) = m
          p += 1
        }
        out
      }
    val sorted = mins.distinct.sorted
    new GenericArrayData(sorted)
  }
}
