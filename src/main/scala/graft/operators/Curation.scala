package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed curation pipeline — the end-user shape every operator
  * family in this library exists for: one call that takes a raw corpus
  * plus an eval benchmark and returns a per-document keep/reject verdict
  * with the REASON attributed, so corpus health is debuggable ("34% of
  * src7 fell to `repetitive`") rather than a single opaque survival rate.
  */
object Curation {

  /** Stage names in precedence order — a document failing several stages
    * reports the FIRST: `duplicate` (not the min-id canonical of its
    * exact-content group), `contaminated` (shares a `shingleTokens`-token
    * shingle with the benchmark), `gopher` (fails the
    * [[TextAnalysis.gopherRules]] battery), `low_quality`
    * ([[TextAnalysis.qualityScore]] under `minQuality`), `repetitive`
    * (top-word fraction over `maxTopWordFrac`; token-free text counts as
    * repetitive by convention but fails `gopher` first).
    */
  val Reasons: Seq[String] =
    Seq("duplicate", "contaminated", "gopher", "low_quality", "repetitive")

  /** One row per document: (idCol, keep, reason — null when kept).
    *
    * Scale shape: ONE corpus scan computes fingerprint + all per-row
    * quality signals (the token kernels CSE-share their walks), one
    * 16-byte-key window resolves exact-dup canonicals ([[Dedup.
    * exactDedup]]'s single-scan form), and contamination arrives as a
    * contamination-SIZED id list (benchmark shingles broadcast;
    * [[Decontaminate.contaminatedIds]]) left-joined back — AQE
    * broadcasts it in the expected eval-set-sized case. Document text
    * never shuffles; the only corpus-wide shuffle keys are the
    * fingerprint window and the id join.
    */
  def curate(docs: DataFrame, benchmark: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      minQuality: Double = 0.5, maxTopWordFrac: Double = 0.5,
      shingleTokens: Int = 8): DataFrame = {
    val text = col(textCol)
    val n = TextAnalysis.tokenCount(text)
    val topFrac = when(n > 0,
      graft.functions.TextStatsFunctions
        .topTokenCount(TextAnalysis.tokens(text)).cast("double") / n)
    val scored = docs.select(col(idCol),
      TextAnalysis.fingerprint(text).as("__fp"),
      TextAnalysis.gopherRules(text).getField("pass").as("__gopher"),
      (TextAnalysis.qualityScore(text) >= minQuality).as("__quality"),
      coalesce(topFrac <= maxTopWordFrac, lit(false)).as("__calm"))
    val withCanon = scored.withColumn("__canon",
      min(col(idCol)).over(Window.partitionBy(col("__fp"))))
    val hits = Decontaminate
      .contaminatedIds(docs, benchmark, textCol, idCol, shingleTokens)
      .withColumn("__cont", lit(true))
    val reason = when(col(idCol) =!= col("__canon"), "duplicate")
      .when(coalesce(col("__cont"), lit(false)), "contaminated")
      .when(!col("__gopher"), "gopher")
      .when(!col("__quality"), "low_quality")
      .when(!col("__calm"), "repetitive")
    withCanon.join(hits, Seq(idCol), "left")
      .select(col(idCol), reason.isNull.as("keep"), reason.as("reason"))
  }

  /** Per-HOST web-curation report (round 17) — the crawl-ops dashboard
    * artifact on top of [[curateWeb]]: the frontier team doesn't read
    * per-page verdicts, it reads "which HOSTS are wasting our crawl
    * budget and why" — so the verdicts aggregate by host with the
    * reason mix attributed. One row per host (null host = the
    * unparseable-URL bucket, reported, never silently dropped):
    * (host, docs, kept, n_blocked_host, n_url_duplicate, n_spam_host,
    * n_content — any content-stage reason — keep_frac).
    *
    * Scale shape: [[curateWeb]]'s own (its scaladoc applies), plus one
    * id-keyed projection join to re-attach hosts and ONE
    * host-cardinality aggregate (map-side combined — hosts number tens
    * of millions at web scale, far below page count). All counts are
    * exact integers; `keep_frac` is one int/int double division,
    * engine-identical.
    */
  def webCurationReport(docs: DataFrame, benchmark: DataFrame,
      blocklist: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", urlCol: String = "url",
      minQuality: Double = 0.5, maxTopWordFrac: Double = 0.5,
      shingleTokens: Int = 8, spamMaxDupFrac: Double = 0.5): DataFrame = {
    val verdicts = curateWeb(docs, benchmark, blocklist, textCol, idCol,
      urlCol, minQuality, maxTopWordFrac, shingleTokens, spamMaxDupFrac)
    val hosts = docs.select(col(idCol), Urls.hostOf(col(urlCol)).as("host"))
    def n(cond: Column) = sum(when(cond, 1L).otherwise(0L))
    verdicts.join(hosts, Seq(idCol))
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("docs"),
        n(col("keep")).as("kept"),
        n(col("reason") === "blocked_host").as("n_blocked_host"),
        n(col("reason") === "url_duplicate").as("n_url_duplicate"),
        n(col("reason") === "spam_host").as("n_spam_host"),
        n(!col("keep") && !col("reason").isin(
          "blocked_host", "url_duplicate", "spam_host")).as("n_content"))
      .withColumn("keep_frac",
        col("kept").cast("double") / col("docs").cast("double"))
  }

  /** Curation with span EXCISION instead of drop (round 17) — the
    * published remedy for verbatim benchmark leaks (the C4/FineWeb
    * line-removal idea at span granularity): a document whose ONLY
    * failing screen is `contaminated` keeps its 99%-original text with
    * the leaked run cut out, instead of being thrown away wholesale.
    *
    * Semantics, two [[curate]] passes around a surgical middle:
    *  1. first verdict over the raw corpus;
    *  2. docs whose reason is EXACTLY `contaminated` (any stricter
    *     reason still rejects) get their shared spans localized
    *     ([[Decontaminate.spanDecontaminate]] — winnow fingerprints, so
    *     only runs the span screen can actually find) and excised
    *     ([[Decontaminate.exciseSpans]] — interval-merged stitch);
    *  3. the verdict RECOMPUTES over the patched corpus. Re-curation is
    *     deliberate and total: excision changes fingerprints (a patched
    *     canonical splits from its verbatim twins), can leave residual
    *     shingle overlap (a sub-`minSpanChars` leak the span screen
    *     refuses to report — the doc stays `contaminated`), and can
    *     gut a short doc below the gopher/quality floors (`gopher` /
    *     `low_quality` — cutting the leak is not a free pass). A doc is
    *     RESCUED only if its patched text survives the full battery.
    *
    * Output one row per document: (idCol, keep, reason — the second
    * verdict — excised = the doc went through the excision stage (pass-1
    * `contaminated`; n_excised_chars = 0 when the span screen could not
    * localize anything to cut), n_excised_chars, textCol = the text the
    * verdict was rendered on: patched for excised docs, original
    * otherwise).
    *
    * Scale shape: two [[curate]] passes (each one corpus scan + the
    * 16-byte-key shuffles); the span/excise middle touches ONLY the
    * contamination-sized subset (left_semi on the first verdict's
    * contaminated ids, localCheckpointed — id-width), and the patch
    * join-back is id-keyed. Document text shuffles nowhere.
    */
  def curateAndExcise(docs: DataFrame, benchmark: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      benchIdCol: String = "bench_id",
      minQuality: Double = 0.5, maxTopWordFrac: Double = 0.5,
      shingleTokens: Int = 8, minSpanChars: Int = 64,
      maxGapGrams: Int = 16): DataFrame = {
    val first = curate(docs, benchmark, textCol, idCol, minQuality,
      maxTopWordFrac, shingleTokens)
    val contIds = first.filter(col("reason") === "contaminated")
      .select(col(idCol)).transform(Persist.round)
    val contDocs = docs.join(contIds, Seq(idCol), "left_semi")
      .select(col(idCol), col(textCol))
    val spans = Decontaminate.spanDecontaminate(contDocs, benchmark,
      textCol, idCol, benchIdCol, minSpanChars, maxGapGrams)
    val excised = Decontaminate.exciseSpans(contDocs, spans, textCol, idCol)
    val patched = docs.select(col(idCol), col(textCol))
      .join(excised.select(col(idCol), col(textCol).as("__ex"),
        col("n_excised_chars")), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__ex"), col(textCol)).as(textCol),
        col("__ex").isNotNull.as("excised"),
        coalesce(col("n_excised_chars"), lit(0)).as("n_excised_chars"))
    val second = curate(patched, benchmark, textCol, idCol, minQuality,
      maxTopWordFrac, shingleTokens)
    patched.join(second, Seq(idCol))
      .select(col(idCol), col("keep"), col("reason"), col("excised"),
        col("n_excised_chars"), col(textCol))
  }

  /** [[WebReasons]] — [[curateWeb]]'s precedence: the URL stages come
    * FIRST because they are the cheap screens a crawl pipeline runs
    * before touching content — `blocked_host` (policy: the host is on
    * the blocklist, nothing else about the page matters), then
    * `url_duplicate` (the same RESOURCE under a cosmetic URL variant —
    * cheaper to attribute than content dedup and catches the refetch
    * before bytes are compared), then `spam_host` (round 17, VERDICT
    * r16 #2: the host's URL-dup fraction marks it a session-id mill /
    * calendar trap — host evidence is still cheaper than content, so it
    * sits after the per-page URL screens and before every content
    * reason), then [[Reasons]] unchanged.
    */
  val WebReasons: Seq[String] =
    Seq("blocked_host", "url_duplicate", "spam_host") ++ Reasons

  /** WEB-crawl curation — [[curate]] with the URL stages composed in
    * front: one call from a crawl frame (id, url, text) + benchmark +
    * domain blocklist to the per-document verdict, reason precedence
    * [[WebReasons]]. Each stage is an individually-gated operator
    * ([[Urls.hostBlocklistFilter]] q160, [[Urls.hostReputation]] q157 —
    * which carries BOTH the per-document `is_dup` flag (q156's
    * equivalence class, [[Urls.urlFingerprint]]) and the host `spam_host`
    * verdict off one call, [[curate]] q90); the composition adds only
    * id-keyed projection joins — the URL screens never see text, the
    * content screens never see URLs, and the corpus text still never
    * shuffles.
    *
    * `spamMaxDupFrac` is [[Urls.hostReputation]]'s gate: a host whose
    * URL-dup fraction EXCEEDS it is spam and every one of its documents
    * falls to `spam_host` (unless a stricter screen caught it first).
    */
  def curateWeb(docs: DataFrame, benchmark: DataFrame,
      blocklist: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", urlCol: String = "url",
      minQuality: Double = 0.5, maxTopWordFrac: Double = 0.5,
      shingleTokens: Int = 8, spamMaxDupFrac: Double = 0.5): DataFrame = {
    val blocked = Urls.hostBlocklistFilter(docs, blocklist, urlCol, idCol)
      .select(col(idCol), col("blocked").as("__blk"))
    val rep = Urls.hostReputation(docs, urlCol, idCol, spamMaxDupFrac)
      .select(col(idCol), col("is_dup").as("__ud"),
        col("spam_host").as("__spam"))
    val content = curate(docs, benchmark, textCol, idCol, minQuality,
      maxTopWordFrac, shingleTokens)
    val reason = when(col("__blk"), "blocked_host")
      .when(col("__ud"), "url_duplicate")
      .when(col("__spam"), "spam_host")
      .otherwise(col("reason"))
    content.join(blocked, Seq(idCol)).join(rep, Seq(idCol))
      .select(col(idCol), reason.isNull.as("keep"), reason.as("reason"))
  }
}
