package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd one-pass token statistics kernel.
  *
  * The declarative formulation (`aggregate(tokens, ...)` for total token
  * chars, `filter(tokens, isin(stopwords))` for stopword hits) is
  * interpreted — per-element lambda dispatch — AND `CollapseProject`
  * inlines the token-array projection into every lambda, re-splitting the
  * text once per heuristic (the same trap ShingleExpressions documents;
  * measured 3.4 s vs 0.5 s for the strictly-larger q30 stat set at
  * sf0.1). This expression walks the UTF-8 bytes exactly once and returns
  * all three counters as one struct; every consumer projects fields off
  * the SAME deterministic subtree, so whole-stage codegen's subexpression
  * elimination evaluates the walk once per row no matter how many stats a
  * query derives from it.
  *
  * Token semantics are identical to `split(text, "\\s+")` with empties
  * dropped (Java regex `\s` = ASCII whitespace, so a byte-level split is
  * exact even in multi-byte UTF-8); char counts are code points
  * (UTF8String.numChars semantics — matches both Spark's `length` and
  * DuckDB's); stopword matching is exact token equality.
  */
object TextStatsFunctions {
  /** Struct column (n_tokens INT, token_chars BIGINT, stopword_hits INT,
    * alpha_tokens INT).
    */
  def tokenStats(text: Column,
      stopwords: Seq[String] = TokenStatsExpr.DefaultStopwords): Column =
    ExpressionUtils.column(
      TokenStatsExpr(ExpressionUtils.expression(text), stopwords))

  /** Max multiplicity of any element of a string array (0 for empty) —
    * the per-row kernel behind the top-word repetition signal: one hash
    * pass per row inside the scan stage, where the explode → two-level
    * groupBy → join-back formulation shuffles every (doc, token) pair.
    */
  def topTokenCount(tokens: Column): Column =
    ExpressionUtils.column(
      TopTokenCountExpr(ExpressionUtils.expression(tokens)))
}

/** See [[TextStatsFunctions.topTokenCount]]. */
case class TopTokenCountExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "top_token_count"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.stringArray(prettyName, child.dataType)

  protected override def nullSafeEval(input: Any): Any =
    TopTokenCountExpr.topCount(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TopTokenCountExpr.topCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopTokenCountExpr {
  /** Shared by eval and generated code (static forwarder). */
  def topCount(a: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val n = a.numElements()
    if (n == 0) return 0
    val m = new java.util.HashMap[UTF8String, Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val t = a.getUTF8String(i)
        val prev = m.get(t)
        val c = if (prev == null) 1 else prev.intValue() + 1
        m.put(t, c)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }
}

/** See [[TextStatsFunctions.tokenStats]]. */
case class TokenStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = TokenStatsExpr.Schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_stats"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.string(prettyName, child.dataType)

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes("UTF-8")).toArray

  protected override def nullSafeEval(input: Any): Any =
    TokenStatsExpr.stats(input.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stops", stopBytes, "byte[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenStatsExpr.stats($c, $stopsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStatsExpr {

  /** English stopwords — the canonical default
    * ([[graft.operators.TextAnalysis.StopwordsEn]] aliases this).
    */
  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "for", "on", "with")

  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("token_chars", LongType, nullable = false),
    StructField("stopword_hits", IntegerType, nullable = false),
    // tokens containing >= 1 ASCII letter — the Gopher "fraction of
    // words with an alphabetic character" rule's numerator. ASCII-only
    // by declared contract (matches the oracle's [A-Za-z] regex).
    StructField("alpha_tokens", IntegerType, nullable = false)))

  /** Shared by eval and generated code (static forwarder): one walk over
    * the UTF-8 bytes — whitespace-run tokenization, per-token code-point
    * count, exact-equality stopword matching.
    */
  def stats(s: UTF8String, stops: Array[Array[Byte]]): InternalRow = {
    val nBytes = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var i = 0
    var nTokens = 0
    var chars = 0L
    var hits = 0
    var alphaToks = 0
    while (i < nBytes) {
      if (isWs(Platform.getByte(base, off + i))) {
        i += 1
      } else {
        val start = i
        var tokChars = 0
        var hasAlpha = false
        var b = Platform.getByte(base, off + i)
        while (i < nBytes && !isWs(b)) {
          if ((b & 0xc0) != 0x80) tokChars += 1
          if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) hasAlpha = true
          i += 1
          if (i < nBytes) b = Platform.getByte(base, off + i)
        }
        nTokens += 1
        chars += tokChars
        if (hasAlpha) alphaToks += 1
        if (matchesStop(base, off + start, i - start, stops)) hits += 1
      }
    }
    new GenericInternalRow(Array[Any](nTokens, chars, hits, alphaToks))
  }

  // Java regex \s (as used by split/string_split_regex): ASCII-only.
  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0b || b == 0x0c || b == 0x0d

  private def matchesStop(base: AnyRef, addr: Long, len: Int,
      stops: Array[Array[Byte]]): Boolean = {
    var k = 0
    while (k < stops.length) {
      val st = stops(k)
      if (st.length == len) {
        var j = 0
        var ok = true
        while (ok && j < len) {
          if (Platform.getByte(base, addr + j) != st(j)) ok = false
          j += 1
        }
        if (ok) return true
      }
      k += 1
    }
    false
  }
}
