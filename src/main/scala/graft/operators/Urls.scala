package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level curation — the CHEAPEST dedup/filter class a crawl pipeline
  * runs, before any content is even fetched or compared: a web corpus
  * arrives keyed by URL, and the same page surfaces under dozens of
  * cosmetic URL variants (tracking parameters, fragments, case-folded
  * hosts, default ports, trailing slashes). Canonicalizing URLs and
  * scoring HOSTS (C4 filters by domain blocklist; RefinedWeb/CCNet treat
  * the registered domain as the curation unit) is the step that makes
  * every downstream content operator touch each page once.
  *
  * Everything here is pure Column arithmetic over RE2∩Java-dialect
  * regexes (the [[TextAnalysis.redactPii]] discipline), so normalization
  * is character-identical cross-engine and the DuckDB oracle replays it
  * verbatim. Per-row, scan speed; the only shuffles carry 16-byte
  * fingerprint keys ([[Dedup.exactDedup]]'s single-scan window form in
  * [[urlDedup]]; the skew-proof agg + join-back form in
  * [[hostReputation]]) and the host-cardinality aggregate.
  */
object Urls {

  private val SchemePrefix = "^[A-Za-z][A-Za-z0-9+.-]*://"

  /** Query parameters dropped by [[normalizeUrl]]: the click-tracking
    * decorations that never change page content (Google/Facebook/
    * Mailchimp click ids, `utm_*` campaign tags, bare `ref`).
    */
  val TrackingParams = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref|mc_eid)(=|$)"

  /** Canonical URL form for crawl-level dedup. Steps, in order:
    * fragment stripped; scheme and host(:port) lowercased (path and
    * query are case-SIGNIFICANT — /Docs and /docs are different
    * resources); default port stripped (`:80` for http, `:443` for
    * https); tracking parameters ([[TrackingParams]]) dropped and the
    * survivors sorted bytewise (param order never changes content, and
    * sorting makes `?a=1&b=2` ≡ `?b=2&a=1`); empty query drops its `?`;
    * empty path becomes `/` and one trailing slash folds off non-root
    * paths.
    *
    * Contract edges: a string without a `scheme://` prefix passes
    * through trimmed and fragment-stripped only (it is not a URL this
    * operator understands — pass-through beats silently corrupting it);
    * userinfo (`user:pass@host`) and path-segment equivalences
    * (`//`, `/./`) are out of scope — the crawl frontier should never
    * emit them, and folding them needs a real parser, not a canonical
    * form.
    */
  def normalizeUrl(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(regexp_extract(u,
      "^([A-Za-z][A-Za-z0-9+.-]*)://.*$", 1))
    val hostPort = lower(regexp_extract(u, SchemePrefix + "([^/?#]*).*$", 1))
    val rest = regexp_extract(u, SchemePrefix + "[^/?#]*(.*)$", 1)
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val rawPath = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParams)))
    val qNorm = concat_ws("&", params)
    val path = when(rawPath === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "^(.+?)/$", "$1"))
    when(u.rlike(SchemePrefix),
      concat(scheme, lit("://"), host, path,
        when(qNorm =!= "", concat(lit("?"), qNorm)).otherwise(lit(""))))
      .otherwise(u)
  }

  /** Lowercased host of a `scheme://` URL, ports and everything after
    * the authority excluded; null for strings the scheme regex rejects.
    */
  def hostOf(url: Column): Column = {
    val h = lower(regexp_extract(trim(url), SchemePrefix + "([^/?#:]*).*$", 1))
    when(h =!= "", h)
  }

  /** The URL dedup key: `md5(normalizeUrl(url))`, with NULL urls given a
    * per-row unique fingerprint derived from the id — so every null-url
    * row is its OWN canonical and never flagged a duplicate. Without the
    * coalesce, md5(null) is null and the dedup window funnels every
    * null-url document into one group, flagging all but one `is_dup` —
    * which contradicts the sibling contracts that unparseable input is
    * never silently screened ([[hostBlocklistFilter]]'s null hosts are
    * "never blocked"; [[normalizeUrl]]'s pass-through-beats-corruption)
    * (ADVICE r16). Shared kernel of [[urlDedup]], [[hostReputation]],
    * and the streaming twin — value-identical by construction.
    */
  def urlFingerprint(url: Column, id: Column): Column =
    coalesce(md5(normalizeUrl(url)),
      md5(concat(lit("null-url#"), id.cast("string"))))

  /** Crawl-level exact dedup keyed on the CANONICAL URL — one more
    * pluggable fingerprint class for [[Dedup.exactDedup]] (q35
    * whitespace/case, q125 CCNet-aggressive, q150 NFKC fold, and now the
    * URL class): same single-scan window plan, the per-row key kernel is
    * [[urlFingerprint]] (null urls are their own canonical). Returns
    * (idCol, canonical_id, is_dup).
    */
  def urlDedup(df: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id"): DataFrame =
    Dedup.exactDedup(df, urlCol, idCol,
      fingerprinter = u => urlFingerprint(u, col(idCol)))

  /** Domain-blocklist screen (the C4/RefinedWeb URL-filter stage): a
    * document is blocked when its host equals a blocklist entry OR sits
    * under one (`a.b.example.com` is blocked by `example.com` — the
    * registrable-domain suffix rule). Returns (idCol, host, blocked);
    * null-host rows are never blocked (they fail URL parsing, not
    * policy — screen them separately if the frontier shouldn't emit
    * them).
    *
    * Scale shape: real blocklists run to ~10⁵–10⁶ domains, so the wrong
    * plan is an interpreted per-row loop over the list; instead the host
    * EXPLODES into its label-suffix chain (`www.h7.example.com` → 4
    * suffixes — bounded by label count, ≤ ~10, independent of corpus or
    * blocklist size) and the chain left-semi-joins the blocklist
    * broadcast. Per-doc fan-out is the label count; the blocklist ships
    * once per executor.
    */
  /** The host's label-suffix chain (`www.h7.example.com` → 4 entries
    * down to `com`) — the registrable-domain membership kernel, shared
    * by [[hostBlocklistFilter]] and its streaming twin so the two
    * screens agree by construction. Bounded by label count (≤ ~10),
    * independent of corpus or blocklist size; null host → null chain.
    */
  def hostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels)), "."))
  }

  /** Blocklist-entry normalization, driver-side twin of the Column form
    * the batch join applies (lowercase, trim, strip one trailing root
    * dot) — ASCII domain convention.
    */
  def normalizeBlocklistEntry(d: String): String =
    d.trim.toLowerCase(java.util.Locale.ROOT).stripSuffix(".")

  def hostBlocklistFilter(df: DataFrame, blocklist: DataFrame,
      urlCol: String = "url", idCol: String = "doc_id",
      domainCol: String = "domain"): DataFrame = {
    val hosts = df.select(col(idCol), hostOf(col(urlCol)).as("host"))
    val suffixes = hostSuffixes(col("host"))
    // The blocklist side normalizes to the document-host convention
    // (lowercased, trimmed, trailing root-dot stripped) — real blocklist
    // feeds carry uppercase entries, padding, and FQDN trailing dots, and
    // a verbatim join silently never matches them: a false-NEGATIVE
    // policy screen (ADVICE r16).
    val cleaned = broadcast(blocklist.select(
      regexp_replace(lower(trim(col(domainCol))), "\\.$", "")
        .as(domainCol)))
    val hits = hosts.where(col("host").isNotNull)
      .select(col(idCol), explode(suffixes).as(domainCol))
      .join(cleaned, Seq(domainCol), "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("__b", lit(true))
    hosts.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("host"),
        coalesce(col("__b"), lit(false)).as("blocked"))
  }

  /** Host-level reputation — the RefinedWeb/CCNet move of scoring the
    * DOMAIN, not the page: a host whose pages are mostly URL-duplicates
    * of each other (session-id mills, calendar traps, faceted-search
    * explosions) is spam-shaped, and the whole host is flagged so the
    * frontier stops crawling it. One row per input document: (idCol,
    * host, is_dup — the per-document URL-duplicate flag, exposed so
    * [[Curation.curateWeb]] reads both screens off ONE call — host_docs,
    * host_dups, dup_frac, spam_host).
    *
    * Scale shape: one corpus scan computes (host, [[urlFingerprint]]);
    * URL-dup flags resolve via the AGG + JOIN-BACK form, not the window
    * form [[Dedup.exactDedup]] defaults to (VERDICT r16): the window
    * funnels every occurrence of one fingerprint through one task, and a
    * calendar-trap host — millions of pages collapsing to a handful of
    * canonical URLs, the very pathology this operator exists to catch —
    * is exactly the hot-fingerprint case. The min(id) aggregate map-side
    * combines (a hot fingerprint collapses to one row per map task
    * before the shuffle) and the join back is a same-key join AQE
    * skew-splits if needed; the second fingerprint scan it costs is
    * already paid here, since the host aggregate forces a second pass
    * anyway. The host aggregate is host-cardinality (tens of millions at
    * web scale — far below page count) and map-side combines; the stats
    * join back on the host key (AQE broadcasts it when small). Documents
    * with no parseable host keep a null host and are never spam-flagged;
    * null URLs are their own canonical ([[urlFingerprint]]) — `dup_frac`
    * is exact int/int double arithmetic, engine-identical.
    */
  def hostReputation(df: DataFrame, urlCol: String = "url",
      idCol: String = "doc_id", maxDupFrac: Double = 0.5): DataFrame = {
    // The (id, host, fp) projection is MATERIALIZED once (localCheckpoint
    // — the keep-list/labels discipline): the regex-heavy URL kernel
    // feeds four lazy branches here (canonical agg, its join probe, the
    // host aggregate, the final join), and leaving it lazy re-runs
    // ~6 normalizeUrl+md5 evaluations per document (measured 5x on the
    // q157 gate by round 17's bench self-adjudication). The frame is
    // narrow — id + host + 16-byte fp, ~40 B/doc at 100 TB.
    val perDoc = df.select(col(idCol), hostOf(col(urlCol)).as("host"),
        urlFingerprint(col(urlCol), col(idCol)).as("__fp"))
      .transform(Persist.round)
    val canon = perDoc.groupBy(col("__fp"))
      .agg(min(col(idCol)).as("__canon"))
    val withDup = perDoc.join(canon, Seq("__fp"))
      .withColumn("is_dup", col(idCol) =!= col("__canon"))
    val hostAgg = withDup.where(col("host").isNotNull)
      .groupBy(col("host"))
      .agg(count(lit(1)).as("host_docs"),
        sum(col("is_dup").cast("long")).as("host_dups"))
    withDup.join(hostAgg, Seq("host"), "left")
      .select(col(idCol), col("host"), col("is_dup"),
        col("host_docs"), col("host_dups"),
        (col("host_dups").cast("double") / col("host_docs").cast("double"))
          .as("dup_frac"),
        coalesce(col("host_dups").cast("double")
          / col("host_docs").cast("double") > maxDupFrac, lit(false))
          .as("spam_host"))
  }
}
