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

  /** Position-carrying selection (array<struct<fp long, pos int>>, pos =
    * 1-based gram index, ascending): the same winnowing pass, keeping
    * WHERE each selected fingerprint sits — the form span merging
    * ([[graft.operators.TextAnalysis.winnowSharedSpans]]) needs. The
    * window tie-break matters here (the SET form is tie-free by
    * construction), so it is pinned to ROBUST winnowing's rule
    * (Schleimer et al. §4: select the RIGHTMOST minimal hash of each
    * window) — deterministic and replayed literally by the SQL oracle.
    */
  def winnowFingerprintPositions(text: Column, k: Int = 8, w: Int = 4)
      : Column =
    ExpressionUtils.column(
      WinnowPosExpr(ExpressionUtils.expression(text), k, w))
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

  /** All k-gram hashes of the code-point sequence (shared with
    * [[WinnowPosExpr]]); null when the string is empty. kk = min(k, n):
    * a sub-k document hashes as one whole-string gram.
    */
  private[functions] def gramHashes(s: UTF8String, k: Int): Array[Long] = {
    // decode code points once, linearly
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n == 0) return null
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
    hashes
  }

  /** Shared by eval and generated code (static forwarder). */
  def fingerprints(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val hashes = gramHashes(s, k)
    if (hashes == null) return new GenericArrayData(Array.emptyLongArray)
    val nHashes = hashes.length
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

/** See [[WinnowFunctions.winnowFingerprintPositions]]. */
case class WinnowPosExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 1, s"winnow_fingerprint_positions k must be >= 1, got $k")
  require(w >= 1, s"winnow_fingerprint_positions w must be >= 1, got $w")

  override def dataType: DataType = WinnowPosExpr.Schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprint_positions"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.string(prettyName, child.dataType)

  protected override def nullSafeEval(input: Any): Any =
    WinnowPosExpr.positions(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowPosExpr.positions($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowPosExpr {

  val Schema: DataType = ArrayType(
    StructType(Seq(
      StructField("fp", LongType, nullable = false),
      StructField("pos", IntegerType, nullable = false))),
    containsNull = false)

  /** Shared by eval and generated code (static forwarder). Robust
    * winnowing selection: per window the RIGHTMOST minimal hash; a gram
    * position selected by several windows is emitted once (positions are
    * strictly ascending; one hash value per position by construction).
    */
  def positions(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val hashes = WinnowExpr.gramHashes(s, k)
    if (hashes == null) return new GenericArrayData(Array.empty[Any])
    val nHashes = hashes.length
    val selected = new Array[Boolean](nHashes)
    def rightmostArgmin(from: Int, until: Int): Int = {
      var m = Long.MaxValue
      var arg = from
      var q = from
      while (q < until) {
        if (hashes(q) <= m) { m = hashes(q); arg = q }
        q += 1
      }
      arg
    }
    if (nHashes <= w) selected(rightmostArgmin(0, nHashes)) = true
    else {
      var p = 0
      while (p <= nHashes - w) {
        selected(rightmostArgmin(p, p + w)) = true
        p += 1
      }
    }
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < nHashes) {
      if (selected(i)) {
        buf += new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(Array[Any](hashes(i), i + 1))
      }
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }
}
