package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL hygiene for web-corpus curation — the canonicalization step that
  * turns crawl URLs into dedup keys and per-domain grouping keys (C4/
  * CCNet-style pipelines dedup and cap BY canonical URL/domain before any
  * content pass).
  *
  * Everything is built from codegen'd `functions._` string/array
  * expressions — per-row, shuffle-free, no UDFs — so the canonicalization
  * of 100 TB of URLs is a pure map stage fused into whatever scan feeds
  * it. */
object UrlTools {

  /** Tracking-parameter names dropped during canonicalization (the
    * industry-standard scrub set: UTM campaign tags + click ids). */
  val TrackingParams: Seq[String] = Seq("fbclid", "gclid", "msclkid", "ref")
  val TrackingPrefixes: Seq[String] = Seq("utm_")

  /** Canonicalize a URL column:
    *   - scheme and host lowercased; an explicit default port is stripped
    *     (`:443` for https, `:80` for http)
    *   - the fragment is dropped (never reaches the server)
    *   - tracking query params are dropped ([[TrackingParams]] by name,
    *     [[TrackingPrefixes]] by prefix)
    *   - surviving query params are SORTED (param order is not semantic;
    *     sorting makes `?a=1&b=2` and `?b=2&a=1` the same dedup key)
    *   - an empty path becomes `/`
    *
    * Malformed rows (no `scheme://host` shape) canonicalize to NULL rather
    * than passing through unchanged — a downstream URL-dedup must not treat
    * garbage as a distinct valid key. */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    // strip the scheme's default port only (a NON-default port is semantic)
    val host = when(scheme === "https" && hostPort.endsWith(":443"),
        regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http" && hostPort.endsWith(":80"),
        regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val path = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val keptParams = array_sort(filter(
      split(query, "&"),
      p => {
        val name = split(p, "=").getItem(0)
        val tracked = TrackingParams.map(t => name === t)
          .reduce(_ || _) || TrackingPrefixes.map(t => name.startsWith(t)).reduce(_ || _)
        p =!= "" && !tracked
      }))
    val canonQuery = when(size(keptParams) > 0,
      concat(lit("?"), array_join(keptParams, "&"))).otherwise(lit(""))
    when(scheme === "" || hostPort === "", lit(null).cast("string"))
      .otherwise(concat(
        scheme, lit("://"), host,
        when(path === "", lit("/")).otherwise(path),
        canonQuery))
  }

  /** Registered-domain heuristic: the last two dot-labels of the host
    * (`a.b.example.com` → `example.com`). A public-suffix list would refine
    * multi-label TLDs; the two-label form is the standard offline-safe
    * approximation and is what per-domain caps key on. */
  def registeredDomain(url: Column): Column = {
    val hostPort = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val host = regexp_replace(hostPort, ":[0-9]+$", "")
    when(host === "", lit(null).cast("string"))
      .otherwise(regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
  }

  /** Attach `canon_url` and `domain` for a URL column — the map stage a
    * crawl-ingest pipeline runs before URL-level dedup / domain caps. */
  def withCanonicalUrl(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("canon_url", canonicalUrl(col(urlCol)))
      .withColumn("domain", registeredDomain(col(urlCol)))

  /** Polite fetch-frontier scheduling: assign every URL its WAVE — the
    * round-robin slot that fetches at most one URL per domain per wave
    * (wave w = the w-th best URL of its domain under the caller's
    * priority order). Emitting the frontier ordered by (wave, domain)
    * yields the classic politeness interleave: every domain's best URL
    * first, no domain hammered twice before all others got a turn, and
    * per-domain priority respected within the domain.
    *
    * Scale shape: ONE shuffle on the domain key for the per-domain rank
    * window (the usual many-domains case balances it; a mega-domain is
    * exactly the skew [[graft.engine.SkewTools.skewReport]] flags).
    * Deliberately NO global sequence column — the (wave, domain) sort
    * order IS the schedule, and materializing a global row number would
    * cost a needless single-task window (or a prefix-sum pass) at every
    * scale. Callers pass a DETERMINISTIC order (tie-break on the id). */
  def frontierWaves(df: DataFrame, domainCol: String, order: Seq[Column]): DataFrame = {
    require(order.nonEmpty, "ordering must be explicit")
    import org.apache.spark.sql.expressions.Window
    df.withColumn("wave", row_number()
      .over(Window.partitionBy(col(domainCol)).orderBy(order: _*)).cast("long"))
  }

  /** Test/oracle harness: synthesize a messy-but-deterministic URL per row
    * from existing columns (the [[Multimodal.encodePpmFromText]] discipline:
    * both engines can derive the input, the operator under test does the
    * real work). Mixed-case host, explicit default port, unsorted params, a
    * tracking param, and a fragment — every canonicalization rule fires. */
  def syntheticUrl(sourceCol: Column, idCol: Column, langCol: Column): Column =
    concat(lit("https://WWW."), upper(sourceCol), lit(".Example.COM:443/docs/"),
      idCol.cast("string"),
      lit("?utm_source=feed&b="), langCol, lit("&a=1#sec"),
      pmod(idCol, lit(2)).cast("string"))

  /** Query-string parameters as a `map<string,string>` — the structured
    * view tracking-param scrubbing, campaign attribution, and crawl
    * frontier canonicalization all read. One codegen'd `str_to_map` over
    * the substring after `?` (no UDF, no parser state); a URL without a
    * query yields an empty map of the same type so downstream `explode`
    * simply emits nothing. Duplicate keys (`?p=1&p=9`) follow the
    * session's `spark.sql.mapKeyDedupPolicy` — the ANSI default THROWS;
    * set LAST_WIN when parsing wild URLs. `urlCol` is a column NAME
    * (str_to_map has no Column-API binding to compose with). */
  def queryParams(urlCol: String): Column =
    expr(s"""CASE WHEN instr($urlCol, '?') > 0
            |  THEN str_to_map(substring_index($urlCol, '?', -1), '&', '=')
            |  ELSE CAST(map() AS MAP<STRING, STRING>) END""".stripMargin)

  /** Outgoing hyperlink targets of an HTML page — `href` attribute values
    * in document order, the edge-extraction step between WARC ingest
    * (q124/q134) and the host link graph (PageRank/HITS already run on
    * edge lists; this PRODUCES the list from crawled markup). One
    * codegen'd `regexp_extract_all` fused into the scan — no DOM, no UDF:
    * single- or double-quoted attributes, optional whitespace around `=`,
    * case-insensitive tag/attribute; fragment-only links (`href="#top"`)
    * are excluded by the character class, fragments of real links are the
    * canonicalizer's job downstream. A regex is the documented tradeoff
    * at 100 TB: it never backtracks pathologically on this pattern and
    * costs one linear pass per page, where a DOM parse costs an
    * allocation storm per document — crawl-scale link extraction
    * (CommonCrawl's own WAT pipeline included) accepts missing
    * javascript-constructed links. */
  def extractHrefs(htmlCol: String): Column =
    expr(s"""regexp_extract_all($htmlCol, '(?i)(?<![\\\\w:-])href\\\\s*=\\\\s*["\\']([^"\\'#][^"\\']*)', 1)""")

  /** (href, anchor-text) pairs of a page — the WAT-style link-context
    * field next to [[extractHrefs]]'s bare targets: anchor text is the
    * classic query-document relevance signal (it describes the TARGET,
    * not the page it sits on) and the crawl-side input to title/keyword
    * indexing. Same regex-over-markup scale tradeoff as extractHrefs
    * (one linear pass, no DOM): `(?is)` covers multi-line anchors, the
    * lazy body stops at the first `</a>`, fragment-only links are
    * excluded by the href character class. Malformed-markup contract,
    * weaker than extractHrefs': an UNCLOSED `<a>` swallows the next
    * anchor into its body (that link's href is lost — extractHrefs
    * would still find it), and a page whose tail lacks `</a>` costs a
    * scan-to-EOF per remaining anchor attempt (bounded by page size,
    * not pathological backtracking — the engine is still linear per
    * attempt). Crawl pipelines that need every href from broken markup
    * should take targets from extractHrefs and anchors from here.
    * Inner markup (`<b>`, spans)
    * is stripped and whitespace collapsed, so `read\n <b>more</b>` and
    * `read more` normalize identically. Two extraction passes over the
    * same pattern (regexp_extract_all binds ONE group per call) zipped
    * positionally — both passes match the identical span sequence, so
    * the pairing is exact. Returns array<struct<href, anchor>>. */
  def extractAnchors(htmlCol: String): Column = {
    // (?<![\w:-]) guards the attribute name exactly like extractHrefs:
    // without it the lazy [^>]*? scan binds to data-href/xlink:href first
    // and pairs the anchor text with the WRONG target URL (r14 advice;
    // ':' joined the class in r15 — xlink:href slipped the original).
    val pat = "(?is)<a\\\\s[^>]*?(?<![\\\\w:-])href\\\\s*=\\\\s*[\"\\']([^\"\\'#][^\"\\']*)[\"\\'][^>]*>(.*?)</a\\\\s*>"
    expr(s"""zip_with(
      regexp_extract_all($htmlCol, '$pat', 1),
      regexp_extract_all($htmlCol, '$pat', 2),
      (h, t) -> named_struct('href', h,
        'anchor', trim(regexp_replace(regexp_replace(t, '<[^>]+>', ' '), '\\\\s+', ' '))))""")
  }

  /** XML sitemap entries (sitemaps.org protocol): the `<loc>` values of a
    * `<urlset>` (page sitemap) or `<sitemapindex>` (index of further
    * sitemaps — a crawler must recurse, not fetch as pages, so the kind
    * is surfaced as a column). Same regex-over-markup scale argument as
    * [[extractHrefs]]; `<loc>` content is a bare URL by spec (entities
    * beyond the five XML ones are invalid), whitespace around the value
    * is trimmed. Output: (kind 'urlset'|'sitemapindex'|NULL for neither,
    * locs array<string>). */
  def sitemapEntries(xmlCol: String): Column = {
    val kind = s"CASE WHEN $xmlCol RLIKE '(?i)<\\\\s*sitemapindex[\\\\s>]' THEN 'sitemapindex' " +
      s"WHEN $xmlCol RLIKE '(?i)<\\\\s*urlset[\\\\s>]' THEN 'urlset' END"
    expr(s"named_struct('kind', $kind, 'locs', " +
      s"CASE WHEN $kind IS NULL THEN CAST(array() AS ARRAY<STRING>) ELSE " +
      s"transform(regexp_extract_all($xmlCol, '(?i)<loc>\\\\s*([^<]*?)\\\\s*</loc>', 1), x -> trim(x)) END)")
  }
}
