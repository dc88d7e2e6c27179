package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd kernel for the PUBLISHED Gopher repetition semantics
  * (Rae et al. 2021, appendix A1.1): character mass — not occurrence
  * counts — of repeated n-grams.
  *
  * [[graft.operators.TextAnalysis.repetitionStats]]'s occurrence
  * fractions (1 − distinct/total) are the cheap screen; a pipeline tuned
  * to the paper's thresholds (top-2/3/4-gram char fraction > 0.20/0.18/
  * 0.16, duplicated-n-gram char fraction > 0.15…0.10) needs the char
  * masses this kernel returns. One tokenization per row serves every
  * requested n (the per-n gram walk is O(tokens·n) string building —
  * still scan-speed, no shuffle, no HOF lambdas).
  *
  * Character accounting contract (what makes the DuckDB oracle exact):
  * a gram's char mass is the sum of its tokens' CODE-POINT counts —
  * joining spaces excluded — so the oracle reproduces it as
  * `length(gram) − (n−1)` on space-joined grams; the duplicated mass
  * marks token POSITIONS covered by any gram occurring ≥ 2 times and
  * sums marked tokens' chars once (the paper's "taking care not to
  * count characters in overlapping n-grams more than once", expressed
  * declaratively instead of via its reference greedy scan — see the
  * q85 scaladoc for the delta).
  */
object RepetitionFunctions {

  /** array<struct<n_grams int, top_gram_chars long, dup_gram_chars
    * long>>, one entry per requested n (in `ns` order):
    *  - `n_grams`: overlapping n-gram count, max(0, tokens − n + 1);
    *    0 when the text is shorter than n tokens (no whole-text
    *    fallback — a rule that cannot apply reports no mass);
    *  - `top_gram_chars`: occurrences × token-char-mass of the most
    *    frequent n-gram (ties on count break to the LARGEST char mass,
    *    making the product deterministic);
    *  - `dup_gram_chars`: summed char mass of token positions covered
    *    by at least one duplicated n-gram (each position counted once).
    */
  def ngramCharStats(text: Column, ns: Seq[Int]): Column =
    ExpressionUtils.column(
      NgramCharStatsExpr(ExpressionUtils.expression(text), ns))
}

/** See [[RepetitionFunctions.ngramCharStats]]. */
case class NgramCharStatsExpr(child: Expression, ns: Seq[Int])
    extends UnaryExpression {
  require(ns.nonEmpty && ns.forall(_ >= 1),
    s"ngram_char_stats needs ns >= 1, got $ns")

  override def dataType: DataType =
    ArrayType(NgramCharStatsExpr.Entry, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngram_char_stats"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.string(prettyName, child.dataType)

  @transient private lazy val nsArr: Array[Int] = ns.toArray

  protected override def nullSafeEval(input: Any): Any =
    NgramCharStatsExpr.stats(input.asInstanceOf[UTF8String], nsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nsRef = ctx.addReferenceObj("ns", nsArr, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramCharStatsExpr.stats($c, $nsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramCharStatsExpr {
  private val Whitespace = Pattern.compile("\\s+")

  val Entry: StructType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("top_gram_chars", LongType, nullable = false),
    StructField("dup_gram_chars", LongType, nullable = false)))

  /** Shared by eval and generated code (static forwarder). */
  def stats(text: UTF8String, ns: Array[Int]): GenericArrayData = {
    val toks = Whitespace.split(text.toString).filter(_.nonEmpty)
    val nTok = toks.length
    val tokChars = new Array[Long](nTok)
    var t = 0
    while (t < nTok) {
      tokChars(t) = toks(t).codePointCount(0, toks(t).length).toLong
      t += 1
    }
    val out = new Array[Any](ns.length)
    var k = 0
    while (k < ns.length) {
      val n = ns(k)
      val m = nTok - n + 1
      if (m <= 0) {
        out(k) = new GenericInternalRow(Array[Any](0, 0L, 0L))
      } else {
        val counts = new java.util.HashMap[String, Integer](m * 2)
        val grams = new Array[String](m)
        val gchars = new Array[Long](m)
        val sb = new java.lang.StringBuilder(64)
        var i = 0
        while (i < m) {
          sb.setLength(0)
          var cs = 0L
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            cs += tokChars(i + j)
            j += 1
          }
          val g = sb.toString
          grams(i) = g
          gchars(i) = cs
          val prev = counts.get(g)
          counts.put(g, if (prev == null) 1 else prev.intValue() + 1)
          i += 1
        }
        var topCnt = 0
        var topLen = 0L
        val marked = new Array[Boolean](nTok)
        i = 0
        while (i < m) {
          val c = counts.get(grams(i)).intValue()
          if (c > topCnt || (c == topCnt && gchars(i) > topLen)) {
            topCnt = c
            topLen = gchars(i)
          }
          if (c > 1) {
            var j = i
            while (j < i + n) { marked(j) = true; j += 1 }
          }
          i += 1
        }
        var dup = 0L
        t = 0
        while (t < nTok) {
          if (marked(t)) dup += tokChars(t)
          t += 1
        }
        out(k) =
          new GenericInternalRow(Array[Any](m, topCnt.toLong * topLen, dup))
      }
      k += 1
    }
    new GenericArrayData(out)
  }
}
