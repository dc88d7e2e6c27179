package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic subword segmentation kernel — greedy longest-match
  * ("maximal matching") over a fixed subword vocabulary, the WordPiece
  * inference rule (Devlin et al. 2019; Song et al. 2021, "Fast WordPiece
  * Tokenization", describe exactly this longest-match-first loop). The
  * whitespace-token operators (strided chunking q108, pack-sequences,
  * vocab coverage q113) count what a whitespace split sees; an LM loader
  * counts subword PIECES. This kernel makes the two reconcilable: same
  * whitespace tokens in, deterministic piece/unknown counts out.
  *
  * Segmentation rule, per whitespace token (case-sensitive, exact bytes):
  * at position p take the LONGEST vocabulary entry that matches the
  * bytes starting at p and advance past it; if none matches, count one
  * unknown piece and advance one code point. No continuation-marker
  * ("##") variant: the vocabulary is plain substrings, which keeps the
  * rule exactly mirrorable in ANSI SQL (the DuckDB oracle replays the
  * same loop with a recursive CTE).
  *
  * Why a custom expression (same argument as [[InVocabCountExpr]] /
  * [[TokenStatsExpr]]): the match loop is inherently sequential per
  * token, so any declarative rendering is a recursive join — per-row
  * imperative code inside whole-stage codegen is the right shape. The
  * vocabulary compiles to a byte-level trie built once driver-side and
  * shipped via the codegen references array; longest-match is one trie
  * walk per position — O(longest entry), independent of |vocab| — so a
  * 100k-entry BPE vocabulary costs the same per byte as the 20-word gate
  * vocabulary. Matching at the byte level is exact for any UTF-8 text:
  * vocabulary entries are whole code-point sequences, so a byte match
  * always ends on a code-point boundary; the unknown path skips UTF-8
  * continuation bytes to advance exactly one code point.
  */
object SubwordFunctions {
  /** Struct column (n_words INT, n_pieces INT, n_unk INT) over a
    * STRING ARRAY of whitespace tokens: total tokens segmented, total
    * pieces emitted (matched + unknown), unknown pieces. Null array
    * elements are skipped; a null array yields a null struct.
    */
  def subwordStats(tokens: Column, vocab: Seq[String]): Column =
    ExpressionUtils.column(
      SubwordStatsExpr(ExpressionUtils.expression(tokens), vocab))

  /** ARRAY<ARRAY<STRING>> over a STRING ARRAY of whitespace tokens: per
    * word, its greedy-longest-match piece sequence in consumption order
    * (unknown positions yield the single code point as its own piece —
    * the identity that makes piece concatenation reproduce the word).
    * Null/empty words yield empty inner arrays, keeping indices aligned
    * with the input. Same trie walk as [[subwordStats]]; use this form
    * when downstream needs the pieces themselves (pair statistics,
    * piece-level dedup), the stats form when it only needs counts.
    */
  def subwordPieces(tokens: Column, vocab: Seq[String]): Column =
    ExpressionUtils.column(
      SubwordPiecesExpr(ExpressionUtils.expression(tokens), vocab))
}

/** See [[SubwordFunctions.subwordStats]]. The vocabulary is a constructor
  * literal, like [[InVocabCountExpr]]'s: tokenizer vocabs ship with the
  * job, so there is no join and no shuffle in the plan.
  */
case class SubwordStatsExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty, "subword_stats needs a non-empty vocabulary")
  require(vocab.forall(_.nonEmpty),
    "subword_stats vocabulary entries must be non-empty")

  override def dataType: DataType = SubwordStatsExpr.Schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "subword_stats"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.stringArray(prettyName, child.dataType)

  // Rebuilt lazily on executors after plan deserialization (interpreted
  // path); the codegen path carries it in the references array.
  @transient private lazy val trie: SubwordTrie = SubwordTrie.build(vocab)

  protected override def nullSafeEval(input: Any): Any =
    SubwordStatsExpr.stats(input.asInstanceOf[ArrayData], trie)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("subwordTrie", trie,
      "graft.functions.SubwordTrie")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SubwordStatsExpr.stats($c, $trieRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubwordStatsExpr {

  val Schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_pieces", IntegerType, nullable = false),
    StructField("n_unk", IntegerType, nullable = false)))

  /** Shared by eval and generated code (static forwarder). */
  def stats(arr: ArrayData, trie: SubwordTrie): InternalRow = {
    val n = arr.numElements()
    var words = 0
    var pieces = 0
    var unk = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        val bytes = w.getBytes
        if (bytes.length > 0) {
          words += 1
          var p = 0
          while (p < bytes.length) {
            val len = trie.longestMatch(bytes, p)
            if (len > 0) {
              pieces += 1
              p += len
            } else {
              // unknown: one piece, advance one code point (skip the
              // lead byte plus any 10xxxxxx continuation bytes)
              pieces += 1
              unk += 1
              p += 1
              while (p < bytes.length && (bytes(p) & 0xc0) == 0x80) p += 1
            }
          }
        }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](words, pieces, unk))
  }
}

/** See [[SubwordFunctions.subwordPieces]]. Same contract and trie as
  * [[SubwordStatsExpr]]; returns the pieces themselves instead of counts.
  */
case class SubwordPiecesExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  require(vocab.nonEmpty, "subword_pieces needs a non-empty vocabulary")
  require(vocab.forall(_.nonEmpty),
    "subword_pieces vocabulary entries must be non-empty")

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false),
      containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "subword_pieces"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    TypeChecks.stringArray(prettyName, child.dataType)

  @transient private lazy val trie: SubwordTrie = SubwordTrie.build(vocab)

  protected override def nullSafeEval(input: Any): Any =
    SubwordPiecesExpr.pieces(input.asInstanceOf[ArrayData], trie)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val trieRef = ctx.addReferenceObj("subwordTrie", trie,
      "graft.functions.SubwordTrie")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SubwordPiecesExpr.pieces($c, $trieRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SubwordPiecesExpr {

  /** Shared by eval and generated code (static forwarder). Pieces are
    * materialized as COPIES of the matched byte ranges — the input may
    * live in a reused unsafe-row buffer, and these strings outlive the
    * row that produced them.
    */
  def pieces(arr: ArrayData, trie: SubwordTrie): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        out(i) = new GenericArrayData(Array.empty[Any])
      } else {
        val bytes = arr.getUTF8String(i).getBytes
        val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
        var p = 0
        while (p < bytes.length) {
          val len = trie.longestMatch(bytes, p)
          val end = if (len > 0) p + len else {
            // unknown: one code point (lead byte + continuations)
            var q = p + 1
            while (q < bytes.length && (bytes(q) & 0xc0) == 0x80) q += 1
            q
          }
          buf += UTF8String.fromBytes(
            java.util.Arrays.copyOfRange(bytes, p, end))
          p = end
        }
        out(i) = new GenericArrayData(buf.toArray)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Byte-level vocabulary trie. ~sum-of-entry-lengths nodes (a 100k-entry
  * BPE vocab of short pieces is a few hundred thousand small nodes — MBs,
  * well inside task-binary budgets). Serializable so the interpreted
  * eval path can rebuild/ship it; the codegen path references one
  * instance per expression.
  */
final class SubwordTrie private (root: SubwordTrie.Node) extends Serializable {

  /** Length in BYTES of the longest vocabulary entry matching
    * `bytes[from..)`, or 0 if none matches.
    */
  def longestMatch(bytes: Array[Byte], from: Int): Int = {
    var node = root
    var p = from
    var best = 0
    while (p < bytes.length) {
      node = node.child(bytes(p))
      if (node == null) return best
      p += 1
      if (node.terminal) best = p - from
    }
    best
  }
}

object SubwordTrie {

  /** Sparse trie node: sorted parallel byte/child arrays, binary-probed.
    * A 256-ary array per node would cost ~2 KB/node (GBs at BPE-vocab
    * node counts); fan-out in real vocabularies is small, so a compact
    * sorted array probe is both smaller and cache-friendlier.
    */
  final class Node extends Serializable {
    var terminal: Boolean = false
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

    private[SubwordTrie] def getOrAdd(b: Byte): Node = {
      val existing = child(b)
      if (existing != null) return existing
      // insert keeping keys sorted (build-time only; probe stays O(log f))
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

  def build(vocab: Seq[String]): SubwordTrie = {
    val root = new Node
    vocab.foreach { entry =>
      var node = root
      entry.getBytes("UTF-8").foreach { b => node = node.getOrAdd(b) }
      node.terminal = true
    }
    new SubwordTrie(root)
  }
}
