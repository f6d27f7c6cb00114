package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL normalization and registrable-domain extraction — the keying
  * layer every crawl-corpus curation stack runs BEFORE dedup and
  * mixing: raw crawl URLs differ in scheme/host case, default ports,
  * tracking parameters and fragments while naming the same resource,
  * so exact dedup on the raw string under-merges, and per-domain caps
  * need a registrable-domain key, not a hostname.
  *
  * Everything here is a row-local pure projection (regexp extraction /
  * replacement + array filtering) — zero shuffles, rides the scan at
  * 100 TB. Every regex stays inside the Java-regex ∩ RE2 common subset
  * (no lookaround, no backrefs — the [[TextMetrics.EmailRe]] rule), so
  * an external engine replays normalization verbatim.
  *
  * Normalization rules (pinned; RFC 3986 §6's safe set plus the
  * tracking-param strip every curation pipeline adds):
  *  1. scheme and host lowercase;
  *  2. default port stripped (:80 for http, :443 for https; other
  *     ports kept);
  *  3. fragment dropped;
  *  4. tracking query parameters removed (utm_*, gclid, fbclid),
  *     remaining parameters kept IN ORIGINAL ORDER (sorting them
  *     changes semantics for order-sensitive endpoints); a
  *     now-empty query drops its '?';
  *  5. trailing slashes stripped from a non-root path; an empty path
  *     becomes '/';
  *  6. userinfo (user:pass@) is NOT handled (passes through as part
  *     of the authority — the corpora this targets do not carry it).
  * A string with no `scheme://` prefix does not parse and normalizes
  * to NULL — malformed rows surface observably (quarantine them;
  * never silently key on garbage). */
object UrlOps {

  private val SchemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
  private val AuthRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
  private val PathRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
  private val QueryRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*[^?#]*\\?([^#]*)"
  private val TrackRe = "^(utm_[a-zA-Z0-9]+|gclid|fbclid)="

  /** Lowercased scheme, or '' when the string does not parse. */
  def scheme(url: Column): Column = lower(regexp_extract(url, SchemeRe, 1))

  /** Lowercased authority (host[:port]) — '' when unparseable. */
  private def authority(url: Column): Column =
    lower(regexp_extract(url, AuthRe, 1))

  /** Host with the scheme's default port stripped; other ports kept. */
  def normHost(url: Column): Column = {
    val a = authority(url)
    when(scheme(url) === "http", regexp_replace(a, ":80$", ""))
      .when(scheme(url) === "https", regexp_replace(a, ":443$", ""))
      .otherwise(a)
  }

  /** Path with trailing slashes stripped; empty (or all-slash) → '/'. */
  private def normPath(url: Column): Column = {
    val p = regexp_replace(regexp_extract(url, PathRe, 1), "/+$", "")
    when(p === "", lit("/")).otherwise(p)
  }

  /** Query with tracking params filtered out, original order kept;
    * '' when nothing (or nothing non-tracking) remains. */
  private def normQuery(url: Column): Column = {
    val q = regexp_extract(url, QueryRe, 1)
    when(q === "", lit(""))
      .otherwise(array_join(
        filter(split(q, "&"), p => !p.rlike(TrackRe)), "&"))
  }

  /** The normalized URL (rules above), NULL for unparseable input. */
  def normalize(url: Column): Column = {
    val q = normQuery(url)
    when(scheme(url) === "", lit(null).cast("string"))
      .otherwise(concat(
        scheme(url), lit("://"), normHost(url), normPath(url),
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** Registrable domain of a normalized-or-raw host column — PSL-lite:
    * the full Public Suffix List is a 10k-line moving artifact; the
    * expressible-and-honest slice is the structural rule (last two
    * labels) plus the high-traffic second-level public suffixes
    * (co.uk-class), which covers the overwhelming mass of crawl URLs.
    * [[registrableDomainPsl]] is the broadcast-PSL upgrade where
    * exactness matters — the CALLING shape (domain as a groupBy/cap
    * key) is unchanged. An IPv4 literal is its own domain; a
    * single-label host (localhost) too; port, if present, is stripped
    * first, then a trailing FQDN dot ('example.com.' is the same zone
    * as 'example.com' — left in place it would defeat every suffix
    * regex and key all such hosts under one garbage group). A host
    * that is EMPTY after the strips yields NULL — quarantine, never
    * key on garbage. */
  def registrableDomain(host: Column): Column = {
    val h = regexp_replace(
      regexp_replace(lower(host), ":[0-9]+$", ""), "\\.$", "")
    val sld = "(ac|co|com|edu|gov|net|org)"
    val cc = "(au|br|in|jp|kr|mx|nz|uk|za)"
    when(h === "", lit(null).cast("string"))
      .when(h.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$"), h)
      .when(h.rlike("\\." + sld + "\\." + cc + "$"),
        regexp_extract(h, "([^.]+\\.[^.]+\\.[^.]+)$", 1))
      .when(h.rlike("\\."), regexp_extract(h, "([^.]+\\.[^.]+)$", 1))
      .otherwise(h)
  }

  /** [[registrableDomain]] straight from a raw URL (NULL when the URL
    * does not parse) — the per-domain cap / mixing key. */
  def urlDomain(url: Column): Column =
    when(scheme(url) === "", lit(null).cast("string"))
      .otherwise(registrableDomain(normHost(url)))
}
