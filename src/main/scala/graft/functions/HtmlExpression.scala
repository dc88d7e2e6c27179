package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd whole-document HTML extraction kernel (VERDICT r18 wrong
  * #3): the [[graft.operators.Html.extractHtmlText]] pipeline —
  * invisible-content drop, block segmentation, per-block tag strip /
  * entity decode / whitespace collapse, link-density boilerplate
  * verdict, document reassembly — as ONE expression evaluated once per
  * row inside the scan stage.
  *
  * Why: the declarative batch form explodes blocks and shuffles BLOCK
  * TEXT through a `groupBy(id)` reassembly (one of the few places
  * document bytes crossed an exchange in this repo), while the
  * row-local HOF twin runs its per-block lambdas interpreted (the
  * token_stats/Winnow precedent — per-element Catalyst eval dispatch,
  * measured 13× on that family). This kernel is both shuffle-free AND
  * compiled: the 100 TB backfill becomes a pure scan.
  *
  * Exactness: the kernel runs the SAME pattern strings through the
  * SAME engine (java.util.regex — Spark's own `regexp_replace`/`split`
  * backend) in the same order as the declarative pipeline, literal
  * entity replaces in the same single-pass order, code-point lengths
  * (`String.codePointCount` ≡ `UTF8String.numChars` ≡ Spark
  * `length`), and a space-only trim (Spark `trim` semantics — NOT
  * `String.trim`, which would also eat controls the `[ \t\r\n]`
  * collapse leaves behind). Equivalence is triple-gated: the q223/q226
  * DuckDB oracle replay, HtmlSpec's hand-computed traps, and the
  * independent declarative HOF formulation
  * ([[graft.operators.Html.htmlTextCols]]) kept as a cross-check.
  *
  * The three outputs project off ONE struct, so whole-stage codegen's
  * subexpression elimination runs the walk once per row however many
  * of them a query uses.
  */
object HtmlFunctions {

  /** Struct column (text STRING, blocks_total BIGINT, blocks_kept
    * BIGINT) — [[graft.operators.Html.extractHtmlText]]'s row shape.
    */
  def htmlExtract(html: Column, minBlockChars: Int,
      maxLinkDensityPpm: Long): Column =
    ExpressionUtils.column(HtmlExtractExpr(
      ExpressionUtils.expression(html), minBlockChars, maxLinkDensityPpm))
}

/** See [[HtmlFunctions.htmlExtract]]. */
case class HtmlExtractExpr(child: Expression, minBlockChars: Int,
    maxLinkDensityPpm: Long) extends UnaryExpression {

  require(minBlockChars >= 1,
    s"minBlockChars must be >= 1, got $minBlockChars")
  require(maxLinkDensityPpm >= 0 && maxLinkDensityPpm <= 1000000L,
    s"maxLinkDensityPpm must be in [0, 1e6], got $maxLinkDensityPpm")

  override def dataType: DataType = HtmlExtractExpr.Schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "html_extract"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.string(prettyName, child.dataType)

  protected override def nullSafeEval(input: Any): Any =
    HtmlExtractExpr.extract(input.asInstanceOf[UTF8String],
      minBlockChars, maxLinkDensityPpm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HtmlExtractExpr.extract($c, $minBlockChars, " +
        s"${maxLinkDensityPpm}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlExtractExpr {

  val Schema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("blocks_total", LongType, nullable = false),
    StructField("blocks_kept", LongType, nullable = false)))

  // The EXACT pattern strings of graft.operators.Html — the kernel and
  // the declarative pipeline must stay regex-for-regex identical (the
  // DuckDB oracle replays these literally). Keep in sync with
  // Html.BlockTags / dropInvisible / dropAnchors / stripTags.
  private val Invisible = Pattern.compile(
    "(?is)<script\\b[^>]*>.*?</script>|<style\\b[^>]*>.*?</style>|" +
      "<!--.*?-->")
  private val BlockSplit = Pattern.compile(
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|" +
      "th|br|hr|section|article|aside|header|footer|nav|blockquote|" +
      "pre|form|title|head|body|html)(?:[ \\t\\r\\n][^>]*)?>")
  private val Anchors = Pattern.compile("(?is)<a\\b[^>]*>.*?</a>")
  private val Tags = Pattern.compile("(?s)<[^>]*>")
  private val Ws = Pattern.compile("[ \\t\\r\\n]+")

  // &amp; LAST so &amp;lt; decodes to the text &lt; (single-pass order,
  // identical to Html.decodeEntities)
  private val Entities = Array(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** stripTags → decodeEntities → collapse ws → space-only trim, the
    * per-block `toText` pipeline on a Java string.
    */
  private def toText(raw: String): String = {
    var x = Tags.matcher(raw).replaceAll(" ")
    var k = 0
    while (k < Entities.length) {
      x = x.replace(Entities(k)._1, Entities(k)._2)
      k += 1
    }
    x = Ws.matcher(x).replaceAll(" ")
    // Spark trim: spaces only (String.trim would also eat other
    // controls and diverge from the declarative form)
    var lo = 0
    var hi = x.length
    while (lo < hi && x.charAt(lo) == ' ') lo += 1
    while (hi > lo && x.charAt(hi - 1) == ' ') hi -= 1
    x.substring(lo, hi)
  }

  /** Shared by eval and generated code (static forwarder): the whole
    * document pipeline, one call per row.
    */
  def extract(s: UTF8String, minChars: Int, ppm: Long): InternalRow = {
    val visible = Invisible.matcher(s.toString).replaceAll(" ")
    val blocks = BlockSplit.split(visible, -1)
    var total = 0L
    var kept = 0L
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < blocks.length) {
      val raw = blocks(i)
      val text = toText(raw)
      val tc = text.codePointCount(0, text.length).toLong
      if (tc > 0L) {
        total += 1L
        val noAnchor = toText(Anchors.matcher(raw).replaceAll(" "))
        val lc = tc - noAnchor.codePointCount(0, noAnchor.length)
        val boiler = tc < minChars || lc * 1000000L > ppm * tc
        if (!boiler) {
          if (kept > 0L) sb.append('\n')
          sb.append(text)
          kept += 1L
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), total, kept))
  }
}
