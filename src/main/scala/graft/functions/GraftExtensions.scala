package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions installer: exposes the custom codegen
  * expressions as SQL functions, so `spark.sql("SELECT simhash60(...)")`
  * and `expr("dot_product(a, b)")` work alongside the typed
  * [[VectorFunctions]] API.
  *
  * Wire up via `SparkSession.builder.withExtensions(GraftExtensions)` (as
  * [[graft.Sessions]] does) or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.install(ext)
}

object GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = install(ext)

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def reg(ext: SparkSessionExtensions, name: String, usage: String,
      builder: FunctionBuilder): Unit =
    ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** [[strSeqArg]]'s long sibling — cost vectors for the unigram
    * kernel, plan-side constant by design.
    */
  private def longSeqArg(e: Expression, what: String): Seq[Long] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be a constant bigint array, got $e")
    e.eval() match {
      case a: ArrayData =>
        (0 until a.numElements()).map { i =>
          if (a.isNullAt(i)) throw new IllegalArgumentException(
            s"$what must not contain nulls")
          a.getLong(i)
        }
      case other => throw new IllegalArgumentException(
        s"$what must be a constant bigint array, got $other")
    }
  }

  // Vocabulary arguments arrive as `array('a','b',...)` — CreateArray,
  // not Literal, but still foldable: evaluate at registration time. The
  // vocab must be plan-side constant (that is the whole design of the
  // vocab kernels), so non-foldable input is a usage error.
  private def strSeqArg(e: Expression, what: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be a constant string array, got $e")
    e.eval() match {
      case a: ArrayData =>
        (0 until a.numElements()).map { i =>
          if (a.isNullAt(i)) throw new IllegalArgumentException(
            s"$what must not contain nulls")
          a.getUTF8String(i).toString
        }
      case other => throw new IllegalArgumentException(
        s"$what must be a constant string array, got $other")
    }
  }

  def install(ext: SparkSessionExtensions): Unit = {
    reg(ext, "minhash_signature",
      "minhash_signature(shingles, k) - k seeded-xxhash64 min-hashes",
      (args: Seq[Expression]) =>
        MinHashSignatureExpr(args.head, intArg(args(1), "k")))
    reg(ext, "dot_product",
      "dot_product(a, b) - double dot product of float/double arrays",
      (args: Seq[Expression]) => DotProductExpr(args.head, args(1)))
    reg(ext, "sorted_intersect_count",
      "sorted_intersect_count(a, b) - common elements of sorted long arrays",
      (args: Seq[Expression]) => SortedIntersectCountExpr(args.head, args(1)))
    reg(ext, "simhash60",
      "simhash60(tokens) - 60-bit md5-derived SimHash of a token set",
      (args: Seq[Expression]) => SimHash60Expr(args.head))
    reg(ext, "hyperplane_bands",
      "hyperplane_bands(vec, bands, rowsPerBand) - banded SRP sign-bit keys",
      (args: Seq[Expression]) => HyperplaneBandsExpr(args.head,
        intArg(args(1), "bands"), intArg(args(2), "rowsPerBand"), 42L))
    reg(ext, "token_stats",
      "token_stats(text) - one-pass (n_tokens, token_chars, " +
        "stopword_hits, alpha_tokens)",
      (args: Seq[Expression]) =>
        TokenStatsExpr(args.head, TokenStatsExpr.DefaultStopwords))
    reg(ext, "top_token_count",
      "top_token_count(tokens) - max multiplicity of any array element",
      (args: Seq[Expression]) => TopTokenCountExpr(args.head))
    reg(ext, "winnow_fingerprints",
      "winnow_fingerprints(text, k, w) - winnowing rolling-hash fingerprints",
      (args: Seq[Expression]) => WinnowExpr(args.head,
        intArg(args(1), "k"), intArg(args(2), "w")))
    reg(ext, "word_shingles",
      "word_shingles(text, n) - distinct word n-gram shingles",
      (args: Seq[Expression]) =>
        WordShinglesExpr(args.head, intArg(args(1), "n")))
    reg(ext, "word_shingles_all",
      "word_shingles_all(text, n) - word n-gram shingles WITH " +
        "multiplicity (the tf-carrying index form)",
      (args: Seq[Expression]) =>
        AllWordShinglesExpr(args.head, intArg(args(1), "n")))
    reg(ext, "token_chunks",
      "token_chunks(text, size) - consecutive size-token chunks",
      (args: Seq[Expression]) =>
        TokenChunksExpr(args.head, intArg(args(1), "size")))
    reg(ext, "hashed_char_grams",
      "hashed_char_grams(text, n) - sorted distinct hashed char n-grams",
      (args: Seq[Expression]) =>
        HashedCharGramsExpr(args.head, intArg(args(1), "n")))
    reg(ext, "hyperplane_band_rows",
      "hyperplane_band_rows(vec, bands, rowsPerBand) - generator form: " +
        "one (band, key) row per band",
      (args: Seq[Expression]) => HyperplaneBandRowsExpr(args.head,
        intArg(args(1), "bands"), intArg(args(2), "rowsPerBand"), 42L))
    reg(ext, "topk_by",
      "topk_by(id, score, k) - bounded-heap grouped top-k aggregate",
      (args: Seq[Expression]) =>
        TopKByExpr(args.head, args(1), intArg(args(2), "k")))
    reg(ext, "min_k_distinct",
      "min_k_distinct(v, k) - the k smallest distinct longs per group, " +
        "ascending (bounded KMV-sketch buffer)",
      (args: Seq[Expression]) =>
        MinKDistinctExpr(args.head, intArg(args(1), "k")))
    reg(ext, "in_vocab_count",
      "in_vocab_count(tokens, vocab) - tokens present in the constant " +
        "vocabulary (O(1) hash-set probe per token)",
      (args: Seq[Expression]) =>
        InVocabCountExpr(args.head, strSeqArg(args(1), "vocab")))
    reg(ext, "subword_stats",
      "subword_stats(tokens, vocab) - greedy longest-match subword " +
        "segmentation counts (n_words, n_pieces, n_unk)",
      (args: Seq[Expression]) =>
        SubwordStatsExpr(args.head, strSeqArg(args(1), "vocab")))
    reg(ext, "subword_pieces",
      "subword_pieces(tokens, vocab) - per word, its greedy " +
        "longest-match piece sequence (unknowns as their code point)",
      (args: Seq[Expression]) =>
        SubwordPiecesExpr(args.head, strSeqArg(args(1), "vocab")))
    reg(ext, "int8_quantize",
      "int8_quantize(vec) - struct(scale, codes): per-vector symmetric " +
        "int8 quantization (scale = max|v|/127, code = floor(v/scale + 0.5))",
      (args: Seq[Expression]) => Int8QuantizeExpr(args.head))
    reg(ext, "nfkc_fold",
      "nfkc_fold(text) - NFKD compatibility decomposition, combining " +
        "marks stripped, NFC recomposed (fullwidth/ligature/accent fold)",
      (args: Seq[Expression]) => NfkcFoldExpr(args.head))
    reg(ext, "jaro_winkler",
      "jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1] (prefix " +
        "boost capped at 4, applied when jaro > 0.7)",
      (args: Seq[Expression]) => JaroWinklerExpr(args.head, args(1)))
    reg(ext, "html_extract",
      "html_extract(html, minBlockChars, maxLinkDensityPpm) - one-pass " +
        "(text, blocks_total, blocks_kept) HTML extraction with " +
        "link-density boilerplate removal",
      (args: Seq[Expression]) => HtmlExtractExpr(args.head,
        intArg(args(1), "minBlockChars"),
        longArg(args(2), "maxLinkDensityPpm")))
    reg(ext, "unigram_segment",
      "unigram_segment(tokens, pieces, costs, unkCost) - per word, its " +
        "Viterbi min-cost unigram-LM piece sequence (quantized -ln p " +
        "long costs; ties to the smallest edge start; unknown edge " +
        "advances one code point at unkCost)",
      (args: Seq[Expression]) => {
        val pieces = strSeqArg(args(1), "pieces")
        val costs = longSeqArg(args(2), "costs")
        require(pieces.length == costs.length,
          s"unigram_segment: ${pieces.length} pieces vs " +
            s"${costs.length} costs")
        UnigramSegmentExpr(args.head, pieces.zip(costs),
          longArg(args(3), "unkCost"))
      })
  }
}
