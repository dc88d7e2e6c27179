package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.UnigramFunctions

/** Hand-computed gates for the unigram-LM tokenizer (q224/q225). */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def seg(word: String, vocab: Seq[(String, Long)],
      unk: Long = TextAnalysis.UnigramUnkCost): Seq[String] =
    Seq(Tuple1(word)).toDF("w")
      .select(element_at(
        UnigramFunctions.unigramSegment(array(col("w")), vocab, unk), 1))
      .as[Seq[String]].collect().head

  test("viterbi: min cost wins, ties break to the longest last piece") {
    // ab+c and a+b+c tie at 15; the smallest-start rule at position 2
    // keeps prev=0, i.e. the longer piece "ab"
    val v = Seq("ab" -> 10L, "a" -> 5L, "b" -> 5L, "abc" -> 30L,
      "c" -> 5L)
    assert(seg("abc", v) == Seq("ab", "c"))
    // the case the unigram model exists for: greedy longest-match
    // (WordPiece) takes ab+c at 150; Viterbi finds a+bc at 2
    val v2 = Seq("ab" -> 100L, "a" -> 1L, "bc" -> 1L, "b" -> 50L,
      "c" -> 50L)
    assert(seg("abc", v2) == Seq("a", "bc"))
    val greedy = Seq(Tuple1("abc")).toDF("w")
      .select(element_at(graft.functions.SubwordFunctions.subwordPieces(
        array(col("w")), v2.map(_._1)), 1))
      .as[Seq[String]].collect().head
    assert(greedy == Seq("ab", "c"), "the greedy foil changed")
  }

  test("viterbi: unknown code points, empties, guards") {
    val v = Seq("a" -> 1L, "b" -> 1L)
    assert(seg("axb", v) == Seq("a", "x", "b"))
    // multi-byte unknown advances ONE code point, copied intact
    assert(seg("aéb", v) == Seq("a", "é", "b"))
    assert(seg("", v) == Seq.empty)
    // unk cost participates in the DP: a cheap vocab path still beats
    // two unknowns even when a longer unknown-free path exists
    assert(seg("xy", v) == Seq("x", "y"))
    intercept[IllegalArgumentException] {
      UnigramFunctions.unigramSegment(array(lit("a")), Nil, 1L)
    }
    intercept[IllegalArgumentException] {
      UnigramFunctions.unigramSegment(array(lit("a")),
        Seq("a" -> -1L), 1L)
    }
  }

  test("unigram_segment SQL registration: literal arrays, length guard") {
    val got = spark.sql(
        "SELECT unigram_segment(array('abc'), " +
          "array('ab', 'a', 'b', 'bc', 'c'), " +
          "array(100L, 1L, 50L, 1L, 50L), 30000000000L)")
      .as[Seq[Seq[String]]].collect().head
    assert(got == Seq(Seq("a", "bc")), s"got $got")
    intercept[Exception] {
      spark.sql("SELECT unigram_segment(array('x'), array('a', 'b'), " +
        "array(1L), 5L)").collect()
    }
  }

  test("learnUnigramVocab: hand-replayed seed, EM round, and costs") {
    // corpus: "ab ab b" -> dictionary ab(2), b(1). Substrings (maxLen
    // 2): a:2, ab:2, b:3. seedSize=2 keeps (b,3) then (a,2) — "a" < "ab"
    // on the tie; singles {a,b} union -> vocab {a:2, b:3}, total 5.
    // Round 1: "ab" segments a+b (only path) -> usage a:2, b:2+1=3 —
    // the same counts, so costs re-derive from the same totals.
    val docs = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val got = TextAnalysis.learnUnigramVocab(docs, col("text"),
        seedSize = 2, rounds = 1, maxPieceLen = 2)
      .as[(String, Long, Long)].collect().toSet
    val expect = Set(
      ("a", 2L, math.round(math.log(5.0 / 2.0) * 1e9)),
      ("b", 3L, math.round(math.log(5.0 / 3.0) * 1e9)))
    assert(got == expect, s"got $got")
  }

  test("learnUnigramVocab: unused multi-char pieces prune; singles stay") {
    // dictionary abc(2); all substrings seed with equal counts, so the
    // single piece "abc" wins every Viterbi -> ab/bc/c-pairs go unused
    // and prune; singles stay at usage 0 (pseudo-count 1, total 5)
    val docs = Seq((1L, "abc abc")).toDF("doc_id", "text")
    val got = TextAnalysis.learnUnigramVocab(docs, col("text"),
        seedSize = 6, rounds = 2, maxPieceLen = 3)
      .as[(String, Long, Long)].collect().toSet
    val cAbc = math.round(math.log(5.0 / 2.0) * 1e9)
    val c1 = math.round(math.log(5.0 / 1.0) * 1e9)
    assert(got == Set(("abc", 2L, cAbc), ("a", 0L, c1), ("b", 0L, c1),
      ("c", 0L, c1)), s"got $got")
    intercept[IllegalArgumentException] {
      TextAnalysis.learnUnigramVocab(docs, col("text"), 0, 1, 2)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.learnUnigramVocab(docs, col("text"), 2, 0, 2)
    }
  }

  test("learnUnigramVocab: supplementary-plane code points enter the " +
      "seed floor (ADVICE r18 audit)") {
    // Spark's length()/substr() count CODE POINTS, not UTF-16 units
    // (UTF8String.numChars: U+1D11E has length 1), so the seed
    // coverage floor length(piece)===1 ADMITS supplementary chars and
    // agrees with the M-step's codePointCount==1 keep-rule — the
    // advisory's UTF-16 premise does not hold for Spark SQL. This gate
    // pins that: seedSize=1 keeps only (a,3) by ranking, so U+1D11E
    // can ONLY enter through the coverage floor; a UTF-16-based floor
    // would drop it and the final vocabulary would collapse to {a}.
    val clef = "𝄞" // U+1D11E MUSICAL SYMBOL G CLEF
    val docs = Seq((1L, s"${clef}a ${clef}a a")).toDF("doc_id", "text")
    val got = TextAnalysis.learnUnigramVocab(docs, col("text"),
        seedSize = 1, rounds = 1, maxPieceLen = 2)
      .as[(String, Long, Long)].collect().toSet
    // dictionary: clef+a (n=2), a (n=1); vocab after floor = {a:3,
    // clef:2}, total 5; round 1 segments clef+a -> usage clef:2, a:3 —
    // the same totals, so the costs re-derive unchanged
    val expect = Set(
      ("a", 3L, math.round(math.log(5.0 / 3.0) * 1e9)),
      (clef, 2L, math.round(math.log(5.0 / 2.0) * 1e9)))
    assert(got == expect, s"got $got")
    // the byte-level trie segments the 4-byte piece intact
    val enc = TextAnalysis.encodeUnigram(docs, col("text"),
        Seq(clef -> 1L, "a" -> 1L))
      .select(col("encoded")).as[String].collect().head
    assert(enc == s"$clef+a $clef+a a", s"got $enc")
  }

  test("encodeUnigram: document assembly, unknowns, lossless concat") {
    val docs = Seq((1L, "abc xq abc"), (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val v = Seq("abc" -> 1L, "a" -> 5L, "b" -> 5L, "c" -> 5L)
    val got = TextAnalysis.encodeUnigram(docs, col("text"), v)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((3L, 4L, "abc x+q abc")), s"${got(1L)}")
    assert(got(2L) == ((0L, 0L, "")) && got(3L) == ((0L, 0L, "")),
      "empty/null docs must keep their id with an empty encoding")
    // lossless up to whitespace: de-encoding reproduces the tokens
    val (_, _, enc) = got(1L)
    assert(enc.split(" ").map(_.replace("+", "")).toSeq ==
      Seq("abc", "xq", "abc"))
  }
}
