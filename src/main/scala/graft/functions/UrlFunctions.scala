package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + domain curation for web-crawl corpora.
  *
  * A crawl-derived training corpus carries one URL per document, and the
  * first-line curation ops are URL-shaped: canonicalize (so the same page
  * fetched under cosmetically different URLs dedups), extract the
  * registered domain (so per-site caps, blocklists, and mixture weights
  * have a grouping key), and cap/filter per domain. The reference engine
  * has no URL surface (its events carry no crawl provenance); this module
  * is part of the beyond-reference LLM-pipeline layer, alongside
  * [[DedupFunctions]] and [[graft.operators.Sampling]].
  *
  * Every function here is a pure column expression over
  * `org.apache.spark.sql.functions` (codegen'd, no UDFs), and every
  * regex is kept inside the Java-regex ∩ RE2 common subset (character
  * classes, `(?:)` groups, anchors — no backreferences or lookaround) so
  * the DuckDB oracle replays the identical patterns.
  *
  * Scale shape: all per-row narrow transforms — they fuse into the scan
  * under WholeStageCodegen and add no shuffle. The downstream groupings
  * (canonical-URL dedup, per-domain caps) are one hash shuffle each on
  * the derived key.
  */
object UrlFunctions {

  /** Query-param keys dropped during canonicalization: click/campaign
    * tracking that changes per impression but never the page content.
    * `utm_*` is matched by prefix on top of this exact-key list.
    */
  val TrackingKeys: Seq[String] =
    Seq("gclid", "fbclid", "ref", "mc_cid", "mc_eid")

  /** Two-level public suffixes recognized by [[registeredDomain]]. A
    * full public-suffix list is a runtime data file in production
    * crawlers; the curation semantics only need the *shape* (some
    * suffixes span two labels), so a representative compiled-in set
    * keeps the expression pure and the oracle replayable.
    */
  val TwoLevelSuffixRegex: String =
    "([^.]+\\.(?:co|com|org|gov|ac|net)\\.(?:uk|au|jp|br|in))$"

  private def extract(c: Column, re: String): Column = regexp_extract(c, re, 1)

  /** Scheme of an absolute URL, lowercased ("" if not an absolute URL). */
  def urlScheme(url: Column): Column =
    lower(extract(trim(url), "^([A-Za-z][A-Za-z0-9+.-]*)://"))

  /** authority + path + query of an absolute URL — the fragment is
    * dropped here (it is client-side state, never sent to the server).
    */
  private def afterScheme(url: Column): Column =
    extract(trim(url), "^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)")

  private def authority(url: Column): Column =
    lower(extract(afterScheme(url), "^([^/?]+)"))

  /** Lowercased host with any `www.` prefix and `:port` suffix removed. */
  def urlHost(url: Column): Column =
    regexp_replace(extract(authority(url), "^([^:]+)"), "^www\\.", "")

  private def urlPort(url: Column): Column =
    extract(authority(url), ":([0-9]+)$")

  private def pathAndQuery(url: Column): Column =
    extract(afterScheme(url), "^[^/?]+(.*)$")

  /** Path component with trailing slashes collapsed ("/" for the root —
    * `http://h` and `http://h/` are the same resource).
    */
  def urlPath(url: Column): Column = {
    val p = rtrim(extract(pathAndQuery(url), "^([^?]*)"), "/")
    when(p === "", "/").otherwise(p)
  }

  /** Canonical query string: params split on `&`, tracking params
    * removed (`utm_*` by prefix plus [[TrackingKeys]] by key), the rest
    * sorted so param order never distinguishes two URLs ("" if nothing
    * survives).
    */
  def urlQueryNormalized(url: Column): Column = {
    val raw = extract(pathAndQuery(url), "\\?(.*)$")
    val kept = filter(split(raw, "&"), p =>
      p =!= "" && !p.startsWith("utm_") &&
        !substring_index(p, "=", 1).isin(TrackingKeys: _*))
    array_join(array_sort(kept), "&")
  }

  /** Crawl-frontier canonical form of an absolute http(s) URL: scheme
    * and host lowercased, `www.` and default ports (`:80` http /
    * `:443` https) stripped, fragment dropped, trailing path slashes
    * collapsed, tracking params removed and the surviving params
    * sorted. Two raw URLs with equal canonical form are treated as the
    * same page by the dedup layer.
    */
  def normalizeUrl(url: Column): Column = {
    val scheme = urlScheme(url)
    val host = urlHost(url)
    val port = urlPort(url)
    val auth = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"),
      host).otherwise(concat(host, lit(":"), port))
    val q = urlQueryNormalized(url)
    concat(scheme, lit("://"), auth, urlPath(url),
      when(q === "", "").otherwise(concat(lit("?"), q)))
  }

  /** Registered (pay-level) domain of a host: the label directly under
    * the public suffix — `a.b.example.co.uk` → `example.co.uk`,
    * `sub.example.com` → `example.com`, bare single-label hosts pass
    * through. This is the grouping key for per-site caps, blocklists,
    * and domain mixture weights.
    */
  def registeredDomain(host: Column): Column = {
    val twoLevel = extract(host, TwoLevelSuffixRegex)
    val oneLevel = extract(host, "([^.]+\\.[^.]+)$")
    when(twoLevel =!= "", twoLevel)
      .when(oneLevel =!= "", oneLevel)
      .otherwise(host)
  }
}
