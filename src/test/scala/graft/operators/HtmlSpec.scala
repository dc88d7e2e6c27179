package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed gates for the HTML extraction front door (q222/q223). */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private val page =
    "<html><head><title>T</title><style>p{color:red}</style></head>" +
      "<body>" +
      "<div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/a\">About</a></div>" +
      "<p>Hello &amp; world. This paragraph is body prose.</p>" +
      "<br><p>Short</p>" +
      "<script>var x = 1; if (x < 2) { track(); }</script>" +
      "<!-- hidden <p>comment</p> -->" +
      "<div>Read the follow-up article <a href=\"/x\">here</a>.</div>" +
      "<FOOTER><A HREF=\"/p\">Privacy</A> | <A HREF=\"/t\">Terms</A></FOOTER>" +
      "</body></html>"

  test("htmlBlocks: segmentation, invisible content, link density, case") {
    val df = Seq((1L, page)).toDF("id", "html")
    val got = Html.htmlBlocks(df, "id", "html")
      .select("block_text", "text_chars", "link_chars", "is_boilerplate")
      .as[(String, Int, Int, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // script content (with its < and { traps), style, and the comment's
    // fake <p> must all be gone entirely
    assert(!got.keys.exists(t => t.contains("track") || t.contains("var x")
      || t.contains("color:red") || t.contains("comment")),
      s"invisible content leaked into blocks: ${got.keys}")
    // title is its own (short -> boilerplate) block
    assert(got("T") == ((1, 0, true)))
    // nav: 10 chars, all of them anchor text -> short AND link-dense
    assert(got("Home About") == ((10, 10, true)))
    // body prose: entities decoded, no links, long enough -> kept
    assert(got("Hello & world. This paragraph is body prose.") ==
      ((44, 0, false)))
    assert(got("Short") == ((5, 0, true)))
    // mixed block: 36 chars, "here" + its joining spaces = 5 link chars
    // -> 139k ppm, under the 400k default -> kept
    val mixed = got("Read the follow-up article here .")
    assert(mixed._3 == false && mixed._2 > 0 &&
      mixed._1 * 400000L >= mixed._2 * 1000000L, s"mixed block: $mixed")
    // UPPERCASE tags segment and strip the same (the (?i) contract)
    assert(got("Privacy | Terms") ==
      ((15, 14, true)), s"${got.get("Privacy | Terms")}")
    // parameter guards
    intercept[IllegalArgumentException] {
      Html.htmlBlocks(df, "id", "html", minBlockChars = 0)
    }
    intercept[IllegalArgumentException] {
      Html.htmlBlocks(df, "id", "html", maxLinkDensityPpm = 2000000L)
    }
  }

  test("htmlOutlinks: both quote styles, document order, invisible traps, " +
      "relative pass-through") {
    val doc = "<html><body>" +
      "<a href=\"https://a.example.com/x\">one</a>" +
      "<A HREF='https://b.example.com/y'>two</A>" +
      "<a class=\"z\" href=\"/relative/path\">three</a>" +
      "<script>go(\"<a href='https://fake.example.net/'>t</a>\")</script>" +
      "<!-- <a href=\"https://comment.example.net/\">dead</a> -->" +
      "<a name=\"anchor-without-href\">four</a>" +
      "</body></html>"
    val got = Html.htmlOutlinks(
        Seq((1L, doc), (2L, "<p>no links here</p>")).toDF("id", "html"),
        "id", "html")
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq((1L, 0, "https://a.example.com/x"),
      (1L, 1, "https://b.example.com/y"), (1L, 2, "/relative/path")),
      s"got $got")
  }

  test("extractHtmlText: document order, census, all-boilerplate empties") {
    val allBp = "<div><a href=\"/\">Only links here</a></div>"
    val df = Seq((1L, page), (2L, allBp)).toDF("id", "html")
    val got = Html.extractHtmlText(df, "id", "html")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val (text1, total1, kept1) = got(1L)
    assert(kept1 == 2L && total1 >= 6L, s"census wrong: $total1/$kept1")
    // kept blocks joined by \n IN DOCUMENT ORDER
    assert(text1 ==
      "Hello & world. This paragraph is body prose.\n" +
        "Read the follow-up article here .", s"got: $text1")
    // a document whose every block is boilerplate keeps its id with
    // empty text — the census is the signal, the row must survive
    assert(got(2L) == (("", 1L, 0L)), s"${got(2L)}")
    // entity decode order: &amp;lt; is the TEXT "&lt;", never "<"
    val amp = Seq((3L, "<p>use &amp;lt; to write a less-than sign</p>"))
      .toDF("id", "html")
    val t3 = Html.extractHtmlText(amp, "id", "html")
      .select("text").as[String].collect().head
    assert(t3 == "use &lt; to write a less-than sign", s"got: $t3")
  }

  test("extractHtmlText: zero-block pages keep their id (batch ≡ " +
      "row-local twin — ADVICE r18)") {
    // script-only, comment-only, whitespace-markup, and empty pages:
    // htmlBlocks yields NO row for any of them, and the old batch
    // groupBy silently dropped the ids — breaking join-backs and the
    // stream contract. Both forms must now keep every id with
    // text '' / blocks_total 0 / blocks_kept 0.
    val pages = Seq(
      (1L, "<script>var u='http://x.test/';track(u)</script>"),
      (2L, "<!-- nothing to see -->"),
      (3L, "<div>  \n\t </div><p></p>"),
      (4L, ""),
      (5L, page)).toDF("id", "html")
    val batch = Html.extractHtmlText(pages, "id", "html")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(batch.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L),
      s"zero-block ids must survive the batch aggregate: $batch")
    batch.filter(_._1 < 5L).foreach { r =>
      assert(r._2 == "" && r._3 == 0L && r._4 == 0L,
        s"zero-block page must report ('', 0, 0): $r")
    }
    val rowLocal = hofExtract(pages)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(batch == rowLocal,
      s"batch and row-local forms diverge: $batch vs $rowLocal")
  }

  /** The independent declarative HOF formulation (htmlTextCols) as a
    * frame — the kernel's cross-check reference.
    */
  private def hofExtract(pages: org.apache.spark.sql.DataFrame) = {
    val (t, tot, k) = Html.htmlTextCols(col("html"))
    pages.select(col("id"), t.as("text"), tot.as("blocks_total"),
      k.as("blocks_kept"))
  }

  test("extractHtmlText kernel (round 19): ≡ the independent HOF " +
      "formulation on the traps; plan is shuffle-free codegen") {
    val pages = Seq(
      (1L, page),
      (2L, "<div><a href=\"/\">Only links here</a></div>"),
      (3L, "<p>use &amp;lt; to write a less-than sign; &quot;q&#39;s" +
        "&quot; &nbsp;and a &gt; b &lt; c stay decoded</p>"),
      (4L, ""),
      (5L, "<script>var u='http://x.test/';if(1<2){go()}</script>"),
      (6L, "<P CLASS='x'>Uppercase tagged paragraph, long enough to " +
        "keep.</P><p>multi\n  line\t\twhitespace   collapse check " +
        "needs length</p>"),
      // unterminated tag, stray <, entity-in-anchor, surrogate pair
      (7L, "<p>a stray < sign and an &amp; in prose make this block " +
        "long enough</p><div><a href=\"/x\">&amp; link text</a> " +
        "plus some surrounding prose to measure density 😀 " +
        "properly</div>")).toDF("id", "html")
    val kernel = Html.extractHtmlText(pages, "id", "html")
    val hof = hofExtract(pages)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val got = kernel.as[(Long, String, Long, Long)].collect()
      .sortBy(_._1).toSeq
    assert(got == hof,
      s"kernel diverged from the declarative formulation:\n$got\nvs\n$hof")
    // non-default parameters flow through identically
    val k2 = Html.extractHtmlText(pages, "id", "html",
        minBlockChars = 10, maxLinkDensityPpm = 100000L)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    val h2 = {
      val (t, tot, k) = Html.htmlTextCols(col("html"),
        minBlockChars = 10, maxLinkDensityPpm = 100000L)
      pages.select(col("id"), t.as("text"), tot.as("blocks_total"),
        k.as("blocks_kept"))
    }.as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(k2 == h2)
    // the point of the kernel: document bytes never cross an exchange,
    // and the extraction sits inside whole-stage codegen (a range-
    // derived frame — the local fixture above constant-folds to a
    // LocalTableScan and shows no stages at all)
    val wide = Html.extractHtmlText(
      spark.range(8).select($"id",
        concat(lit("<p>paragraph body prose long enough to keep "),
          $"id".cast("string"), lit("</p><div><a href='/'>nav</a></div>"))
          .as("html")),
      "id", "html")
    wide.collect()
    val plan = wide.queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.isEmpty, s"extraction plan must be shuffle-free:\n$plan")
    assert(plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, s"extraction must run under whole-stage codegen:\n$plan")
    // parameter guards live on the expression now
    intercept[IllegalArgumentException] {
      Html.extractHtmlText(pages, "id", "html", minBlockChars = 0)
    }
    intercept[IllegalArgumentException] {
      Html.extractHtmlText(pages, "id", "html",
        maxLinkDensityPpm = 2000000L)
    }
  }
}
