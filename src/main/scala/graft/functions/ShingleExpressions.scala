package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd shingle/gram constructors. The declarative formulations
  * (`transform(sequence(...), i => substring(s, i, n))` etc.) hide an
  * O(n²) trap: the lambda body's reference to `s` is the full inlined
  * normalization expression, re-evaluated once per element — a regex
  * replace per gram, ~4 ms/doc, 22 s for 5000 docs at sf0.1. These
  * expressions evaluate their child exactly once and build the array in
  * a single pass (<1 µs/doc).
  */
object ShingleFunctions {

  /** Distinct word n-gram shingles (array<string>), single whole-text
    * shingle when shorter than n tokens. Token semantics = split on
    * whitespace runs, empties dropped — identical to
    * [[TextAnalysis.tokens]] and the oracle's string_split_regex.
    */
  def wordShingles(text: Column, n: Int): Column =
    ExpressionUtils.column(WordShinglesExpr(ExpressionUtils.expression(text), n))

  /** Word n-gram shingles WITH multiplicity (array<string>, one entry
    * per sliding position) — the term-frequency-carrying sibling of
    * [[wordShingles]] for weighted retrieval ([[graft.operators.Search
    * .shingleIndex]]); identical token/fallback semantics, minus the
    * distinct.
    */
  def wordShinglesAll(text: Column, n: Int): Column =
    ExpressionUtils.column(
      AllWordShinglesExpr(ExpressionUtils.expression(text), n))

  /** Distinct character n-grams of the (already-normalized) input,
    * xxhash64-hashed and sorted ascending (array<long>) — the
    * [[VectorFunctions.sortedIntersectCount]]-ready form. Whole-string
    * single gram when shorter than n chars.
    */
  def hashedCharGrams(normalized: Column, n: Int): Column =
    ExpressionUtils.column(
      HashedCharGramsExpr(ExpressionUtils.expression(normalized), n))

  /** Consecutive non-overlapping `size`-token chunks (array<string>,
    * space-joined; trailing partial chunk kept; empty array on token-free
    * text) — the unit of chunk-level dedup. Token semantics identical to
    * [[wordShingles]]'s (= whitespace split, empties dropped).
    */
  def tokenChunks(text: Column, size: Int): Column =
    ExpressionUtils.column(TokenChunksExpr(ExpressionUtils.expression(text), size))
}

case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_shingles n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.string(prettyName, child.dataType)

  protected override def nullSafeEval(input: Any): Any =
    WordShinglesExpr.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShinglesExpr.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShinglesExpr {
  private val Whitespace = Pattern.compile("\\s+")

  def shingles(text: UTF8String, n: Int): GenericArrayData = {
    val toks = Whitespace.split(text.toString).filter(_.nonEmpty)
    if (toks.length < n) {
      new GenericArrayData(Array[Any](UTF8String.fromString(toks.mkString(" "))))
    } else {
      val seen = new java.util.LinkedHashSet[String](toks.length * 2)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }
}

case class AllWordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"word_shingles_all n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles_all"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.string(prettyName, child.dataType)

  protected override def nullSafeEval(input: Any): Any =
    AllWordShinglesExpr.shinglesAll(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.AllWordShinglesExpr.shinglesAll($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AllWordShinglesExpr {
  private val Whitespace = Pattern.compile("\\s+")

  def shinglesAll(text: UTF8String, n: Int): GenericArrayData = {
    val toks = Whitespace.split(text.toString).filter(_.nonEmpty)
    if (toks.length < n) {
      new GenericArrayData(Array[Any](UTF8String.fromString(toks.mkString(" "))))
    } else {
      val out = new Array[Any](toks.length - n + 1)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

case class TokenChunksExpr(child: Expression, size: Int)
    extends UnaryExpression {
  require(size >= 1, s"token_chunks size must be >= 1, got $size")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_chunks"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.string(prettyName, child.dataType)

  protected override def nullSafeEval(input: Any): Any =
    TokenChunksExpr.chunks(input.asInstanceOf[UTF8String], size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenChunksExpr.chunks($c, $size)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenChunksExpr {
  private val Whitespace = Pattern.compile("\\s+")

  def chunks(text: UTF8String, size: Int): GenericArrayData = {
    val toks = Whitespace.split(text.toString).filter(_.nonEmpty)
    if (toks.length == 0) return new GenericArrayData(Array.empty[Any])
    val n = (toks.length + size - 1) / size
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder(64)
    var c = 0
    while (c < n) {
      sb.setLength(0)
      var j = c * size
      val end = math.min(j + size, toks.length)
      while (j < end) {
        if (j > c * size) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    new GenericArrayData(out)
  }
}

case class HashedCharGramsExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, s"hashed_char_grams n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hashed_char_grams"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.string(prettyName, child.dataType)

  protected override def nullSafeEval(input: Any): Any =
    HashedCharGramsExpr.grams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashedCharGramsExpr.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedCharGramsExpr {
  /** One pass: precompute char-start byte offsets, then hash each
    * n-char byte RANGE in place — no substring objects, no rescans.
    * (UTF8String.substring(i, j) walks from byte 0 per call: O(L²)
    * across a document's grams, measured at ~300 µs/doc; this form is
    * ~5 µs/doc.)
    */
  def grams(s: UTF8String, n: Int): GenericArrayData = {
    val nBytes = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val starts = new Array[Int](nBytes + 1)
    var nc = 0
    var p = 0
    while (p < nBytes) {
      starts(nc) = p
      nc += 1
      p += UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + p))
    }
    starts(nc) = nBytes
    if (nc < n) {
      return new GenericArrayData(Array[Long](
        XXH64.hashUnsafeBytes(base, off, nBytes, 42L)))
    }
    val raw = new Array[Long](nc - n + 1)
    var i = 0
    while (i <= nc - n) {
      raw(i) = XXH64.hashUnsafeBytes(
        base, off + starts(i), starts(i + n) - starts(i), 42L)
      i += 1
    }
    java.util.Arrays.sort(raw)
    // dedupe in place (sorted)
    var w = 0
    var r = 0
    while (r < raw.length) {
      if (w == 0 || raw(r) != raw(w - 1)) { raw(w) = raw(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(raw, w))
  }
}
