package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi (min-cost) unigram-LM segmentation kernel — the inference
  * rule of the SentencePiece unigram model (Kudo 2018 §3: the best
  * segmentation maximizes Σ log p(pieceᵢ), i.e. minimizes Σ cost with
  * cost = −log p): dynamic programming over the word's positions, each
  * vocabulary piece an edge weighted by its quantized-long cost, plus
  * an always-available unknown edge (one code point at `unkCost`) so
  * coverage is total. [[SubwordFunctions.subwordPieces]] is the GREEDY
  * longest-match rule (WordPiece); this kernel is the PROBABILISTIC
  * one — the two differ exactly when a shorter first piece enables a
  * cheaper remainder, which is the case the unigram model exists for.
  *
  * Determinism contract (oracle-mirrored): costs are LONGS (the caller
  * quantizes −ln p, the repo-wide discipline — no float sum ordering
  * can flip a segmentation); dp ties break to the SMALLEST edge start
  * (equivalently: among minimal-cost segmentations, the one whose last
  * piece is longest, applied recursively), which the DuckDB replay
  * expresses as `min(j)` over the argmin set. Matching is byte-level
  * (exact for UTF-8: vocabulary entries are whole code-point
  * sequences); the unknown edge advances one code point.
  *
  * Same custom-expression argument as [[SubwordPiecesExpr]]: the DP is
  * inherently sequential per word — per-row imperative code inside
  * whole-stage codegen, with the vocabulary compiled driver-side into
  * a cost-carrying byte trie shipped via the references array. Walk
  * cost per position is O(longest entry), independent of |vocab|.
  */
object UnigramFunctions {

  /** ARRAY<ARRAY<STRING>> over a STRING ARRAY of whitespace tokens: per
    * word, its min-cost piece sequence in order. Null/empty words yield
    * empty inner arrays, keeping indices aligned with the input.
    */
  def unigramSegment(tokens: Column, vocab: Seq[(String, Long)],
      unkCost: Long): Column =
    ExpressionUtils.column(UnigramSegmentExpr(
      ExpressionUtils.expression(tokens), vocab, unkCost))
}

/** See [[UnigramFunctions.unigramSegment]]. The vocabulary (with costs)
  * is a constructor literal, like [[SubwordPiecesExpr]]'s: unigram
  * vocabularies ship with the job — no join, no shuffle in the plan.
  */
case class UnigramSegmentExpr(child: Expression,
    vocab: Seq[(String, Long)], unkCost: Long) extends UnaryExpression {

  require(vocab.nonEmpty, "unigram_segment needs a non-empty vocabulary")
  require(vocab.forall(_._1.nonEmpty),
    "unigram_segment vocabulary entries must be non-empty")
  require(vocab.forall(_._2 >= 0) && unkCost >= 0,
    "unigram_segment costs must be non-negative (quantized -ln p)")

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false),
      containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_segment"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.stringArray(prettyName, child.dataType)

  @transient private lazy val model: UnigramModel =
    UnigramModel.build(vocab, unkCost)

  protected override def nullSafeEval(input: Any): Any =
    UnigramSegmentExpr.segment(input.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("unigramModel", model,
      "graft.functions.UnigramModel")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramSegmentExpr.segment($c, $modelRef)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object UnigramSegmentExpr {

  /** Shared by eval and generated code (static forwarder). Pieces are
    * COPIES of the matched byte ranges ([[SubwordPiecesExpr.pieces]]'s
    * buffer-reuse caveat).
    */
  def segment(arr: ArrayData, model: UnigramModel): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        out(i) = new GenericArrayData(Array.empty[Any])
      } else {
        out(i) = new GenericArrayData(
          model.viterbi(arr.getUTF8String(i).getBytes))
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** The compiled unigram model: a cost-carrying byte trie plus the
  * Viterbi DP. Serializable for the interpreted path; referenced once
  * per expression in codegen.
  */
final class UnigramModel private (root: UnigramModel.Node,
    unkCost: Long, maxEntryBytes: Int) extends Serializable {

  /** Min-cost segmentation of one word; empty input yields an empty
    * array. Ties break to the smallest edge start at every position
    * (see [[UnigramSegmentExpr]]'s contract).
    */
  def viterbi(bytes: Array[Byte]): Array[Any] = {
    val len = bytes.length
    if (len == 0) return Array.empty[Any]
    val Inf = Long.MaxValue
    val dp = new Array[Long](len + 1)
    val prev = new Array[Int](len + 1)
    java.util.Arrays.fill(dp, Inf)
    java.util.Arrays.fill(prev, -1)
    dp(0) = 0L
    var p = 0
    while (p < len) {
      if (dp(p) != Inf) {
        // vocabulary edges: every terminal on the trie walk from p
        var node = root
        var q = p
        var walking = true
        while (walking && q < len && q - p < maxEntryBytes) {
          node = node.child(bytes(q))
          if (node == null) walking = false
          else {
            q += 1
            if (node.terminal) {
              val cand = dp(p) + node.cost
              if (cand < dp(q)) { dp(q) = cand; prev(q) = p }
              // equal cost: keep the earlier start (p ascends, so the
              // incumbent already has the smaller start)
            }
          }
        }
        // unknown edge: one code point at unkCost, always available
        var e = p + 1
        while (e < len && (bytes(e) & 0xc0) == 0x80) e += 1
        val cand = dp(p) + unkCost
        if (cand < dp(e)) { dp(e) = cand; prev(e) = p }
      }
      p += 1
    }
    // backtrace (the unk edge guarantees dp(len) < Inf)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var end = len
    while (end > 0) {
      val start = prev(end)
      buf += UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, start, end))
      end = start
    }
    buf.reverseIterator.toArray
  }
}

object UnigramModel {

  /** Trie node with a terminal cost ([[SubwordTrie.Node]]'s compact
    * sorted-array layout, plus the cost payload).
    */
  final class Node extends Serializable {
    var terminal: Boolean = false
    var cost: Long = 0L
    private var keys: Array[Byte] = Array.emptyByteArray
    private var kids: Array[Node] = Array.empty

    def child(b: Byte): Node = {
      var lo = 0
      var hi = keys.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val k = keys(mid)
        if (k == b) return kids(mid)
        else if (k < b) lo = mid + 1
        else hi = mid - 1
      }
      null
    }

    private[UnigramModel] def getOrAdd(b: Byte): Node = {
      val existing = child(b)
      if (existing != null) return existing
      var pos = 0
      while (pos < keys.length && keys(pos) < b) pos += 1
      val nk = new Array[Byte](keys.length + 1)
      val nc = new Array[Node](kids.length + 1)
      System.arraycopy(keys, 0, nk, 0, pos)
      System.arraycopy(kids, 0, nc, 0, pos)
      nk(pos) = b
      val fresh = new Node
      nc(pos) = fresh
      System.arraycopy(keys, pos, nk, pos + 1, keys.length - pos)
      System.arraycopy(kids, pos, nc, pos + 1, kids.length - pos)
      keys = nk
      kids = nc
      fresh
    }
  }

  def build(vocab: Seq[(String, Long)], unkCost: Long): UnigramModel = {
    val root = new Node
    var maxBytes = 1
    vocab.foreach { case (entry, cost) =>
      val bytes = entry.getBytes("UTF-8")
      if (bytes.length > maxBytes) maxBytes = bytes.length
      var node = root
      bytes.foreach { b => node = node.getOrAdd(b) }
      // duplicate entries: keep the cheapest (deterministic regardless
      // of input order; a vocab should not carry duplicates anyway)
      if (!node.terminal || cost < node.cost) node.cost = cost
      node.terminal = true
    }
    new UnigramModel(root, unkCost, maxBytes)
  }
}
