package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Internals.{column => toCol, expression => toExpr}

import graft.functions.{PslDomain, PslTrie}

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

  /** Let-bind `c` as a lambda variable before a fan-out of references
    * (a one-element transform — the [[registrableDomainPsl]] lesson,
    * SCALE_r12 §6): a parse-chain input referenced N times would
    * otherwise inline N copies of itself; Catalyst's subexpression
    * elimination does not reach across conditional branches. */
  private def bind1(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

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

  /** The normalized URL (rules above), NULL for unparseable input.
    * TWO binds: the raw url (the rule pieces reference it ~10 times —
    * an expression-valued caller would re-evaluate per reference),
    * then the four parsed pieces as one struct (the assembly
    * references scheme and query twice each, and conditional-branch
    * CSE would not merge them). The inner lambda references only its
    * own variable; the struct construction referencing `u` sits in
    * the OUTER body, so no cross-lambda variable reference exists. */
  def normalize(url: Column): Column = bind1(url) { u =>
    bind1(struct(scheme(u).as("sch"), normHost(u).as("host"),
        normPath(u).as("path"), normQuery(u).as("q"))) { s =>
      val q = s.getField("q")
      when(s.getField("sch") === "", lit(null).cast("string"))
        .otherwise(concat(
          s.getField("sch"), lit("://"), s.getField("host"),
          s.getField("path"),
          when(q === "", lit("")).otherwise(concat(lit("?"), q))))
    }
  }

  /** Registrable domain of a normalized-or-raw host column — PSL-lite:
    * the full Public Suffix List is a 10k-line moving artifact; the
    * expressible-and-honest slice is the structural rule (last two
    * labels) plus the high-traffic second-level public suffixes
    * (co.uk-class), which covers the overwhelming mass of crawl URLs.
    * [[registrableDomainPsl]] is the full-list trie upgrade where
    * exactness matters — the CALLING shape (domain as a groupBy/cap
    * key) is unchanged. An IPv4 literal is its own domain; a
    * single-label host (localhost) too; port, if present, is stripped
    * first, then a trailing FQDN dot ('example.com.' is the same zone
    * as 'example.com' — left in place it would defeat every suffix
    * regex and key all such hosts under one garbage group). A host
    * that is EMPTY after the strips yields NULL — quarantine, never
    * key on garbage. */
  def registrableDomain(host: Column): Column =
    // the stripped host binds once; the match references it 8 times
    bind1(regexp_replace(
        regexp_replace(lower(host), ":[0-9]+$", ""), "\\.+$", "")) { h =>
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
  def urlDomain(url: Column): Column = bind1(url) { u =>
    when(scheme(u) === "", lit(null).cast("string"))
      .otherwise(registrableDomain(normHost(u)))
  }

  /** One Public Suffix List rule: `suffix` holds the rule's labels
    * with the `*.` / `!` markers stripped; a wildcard rule's suffix is
    * the PARENT (the labels after the `*`). */
  final case class PslRule(suffix: String, wildcard: Boolean,
                           exception: Boolean) {
    def labels: Int = suffix.count(_ == '.') + 1
  }

  /** Parse Public Suffix List syntax (publicsuffix.org/list/ — the
    * real artifact's format, so the full list drops in with zero code
    * change): one rule per line, `//` comments and blank lines
    * skipped, `*.` = wildcard, `!` = exception. */
  def parsePsl(lines: Iterator[String]): Seq[PslRule] =
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//"))
      .map { l =>
        if (l.startsWith("!")) PslRule(l.drop(1), wildcard = false,
          exception = true)
        else if (l.startsWith("*.")) PslRule(l.drop(2), wildcard = true,
          exception = false)
        else PslRule(l, wildcard = false, exception = false)
      }.toSeq

  private def loadPslResource(path: String): Seq[PslRule] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"psl resource missing: $path")
    try parsePsl(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** IDNA/punycode (ACE) twin of a rule suffix — each label through
    * UTS #46 nontransitional toASCII ([[graft.functions.IdnAscii
    * .asciiLabel]]), lowercased; None when the twin equals the
    * input (pure-ASCII rule). The published list carries IDN rules as
    * UNICODE labels, but real crawl URLs carry IDN hosts in their
    * on-the-wire punycode form (`xn--55qx5d.cn`), so matching the
    * list's own forms alone silently drops every IDN rule for those
    * hosts (publicsuffix.org's algorithm assumes canonicalization —
    * rules match both forms). A label `toASCII` rejects (not valid
    * IDNA — never the case for published rules) keeps its original
    * form rather than failing the build. */
  def punycodeTwin(suffix: String): Option[String] = {
    // ONE conversion implementation with the host-side canonicalizer
    // ([[graft.functions.IdnAscii]]) — twin rules and canonicalized
    // hosts must agree bit-for-bit or twin matching breaks
    val twin = suffix.split("\\.", -1)
      .map(graft.functions.IdnAscii.asciiLabel).mkString(".")
    if (twin == suffix) None else Some(twin)
  }

  /** Punycode twin of one verbatim PSL LINE (markers preserved):
    * None for comments, blanks, and pure-ASCII rules. The aux-artifact
    * writer ships this next to each raw line so the DuckDB oracle can
    * union both rule forms — DuckDB has no IDNA codec (the xxhash64
    * aux-table precedent). */
  def punycodeTwinLine(rawLine: String): Option[String] = {
    val l = rawLine.trim
    if (l.isEmpty || l.startsWith("//")) None
    else {
      val (marker, body) =
        if (l.startsWith("!")) ("!", l.drop(1))
        else if (l.startsWith("*.")) ("*.", l.drop(2))
        else ("", l)
      punycodeTwin(body).map(marker + _)
    }
  }

  /** Rule set with each IDN rule's punycode twin inserted (same
    * wildcard/exception class) — the form [[trieOf]] and
    * [[registrableDomainPslGen]] compile, so unicode and `xn--` hosts
    * resolve to the same registrable domain. Driver-side, once per
    * rule set; ~466 extra rules on the full list. */
  def withPunycodeTwins(rules: Seq[PslRule]): Seq[PslRule] =
    rules.flatMap { r =>
      r +: punycodeTwin(r.suffix).map(s => r.copy(suffix = s)).toSeq
    }

  /** The committed PSL fixture (resources/psl/public_suffix_fixture
    * .dat) — a slice of the real list covering every rule class. Kept
    * for the generated-expression form's specs and the |rules|-scaling
    * measurement; production keying uses [[PslFull]]. */
  lazy val PslFixture: Seq[PslRule] = loadPslResource(
    "/psl/public_suffix_fixture.dat")

  /** The FULL committed Public Suffix List (resources/psl/
    * public_suffix_list.dat — the pristine publicsuffix.org artifact,
    * ~9.5k rules, ICANN + private sections): the production rule set.
    * Driver-side data, loaded once. */
  lazy val PslFull: Seq[PslRule] = loadPslResource(
    "/psl/public_suffix_list.dat")

  /** [[PslFull]] compiled once into the reversed-label trie the scale
    * path evaluates — O(host labels) per row whatever |rules| is. */
  lazy val PslFullTrie: PslTrie = trieOf(PslFull)

  /** Compile a rule set for [[registrableDomainPsl]] — punycode twins
    * inserted first ([[withPunycodeTwins]]), so a compiled trie always
    * resolves both host forms. One trie per DISTINCT rule set per
    * session is the intended shape (the lazy vals above) — the build
    * is cheap but the compiled object is what ships to executors as a
    * plan reference. */
  def trieOf(rules: Seq[PslRule]): PslTrie =
    PslTrie.build(
      withPunycodeTwins(rules).map(r => (r.suffix, r.wildcard, r.exception)))

  /** Registrable domain under the Public Suffix List algorithm
    * (publicsuffix.org/list/, pinned):
    *  1. candidate rules are those whose labels right-align with the
    *     host's (a wildcard's `*` consumes exactly one extra label);
    *  2. an EXCEPTION rule prevails over everything, and names a
    *     public suffix one label SHORTER than itself;
    *  3. otherwise the matching rule with the MOST labels prevails
    *     (wildcard counting its `*`);
    *  4. no match falls to the default rule `*` (public suffix = the
    *     rightmost label);
    *  5. registrable domain = public suffix + one host label; a host
    *     that IS a public suffix has none → NULL (so `localhost` is
    *     NULL here where PSL-lite keys it on itself — the PSL-exact
    *     posture; bare-suffix hosts quarantine).
    * An IPv4 literal stays its own domain (the [[registrableDomain]]
    * extension — PSL is not defined over IPs, crawl corpora carry
    * them); port and trailing FQDN dot are stripped first; empty → NULL.
    *
    * Shape: the rule set is DRIVER-SIDE data compiled once into a
    * reversed-label trie ([[graft.functions.PslTrie]]) that ships as
    * ONE plan reference object; the match is a single row-local
    * codegen'd expression resolving a host in O(host labels) hash
    * probes. Zero shuffles, zero joins, rides the scan like the lite
    * form — and neither the Catalyst tree nor the per-row cost grows
    * with |rules|, which is what makes the full ~9.5k-rule list safe
    * where the generated form ([[registrableDomainPslGen]]) cliffs
    * (the SCALE_r13 §1 curve). */
  def registrableDomainPsl(host: Column,
                           trie: PslTrie = PslFullTrie): Column =
    toCol(PslDomain(strippedHost(host), trie))

  /** The shared host strip (lowercase, port, trailing FQDN dots) as a
    * Catalyst expression — every PSL entry point applies exactly this. */
  private def strippedHost(host: Column) =
    toExpr(regexp_replace(
      regexp_replace(lower(host), ":[0-9]+$", ""), "\\.+$", ""))

  /** [[registrableDomainPsl]] with the host CANONICALIZED to its
    * on-the-wire ACE form first ([[graft.functions.IdnAscii]] — per
    * label, so mixed-form hosts canonicalize too): `blog.公司.cn` and
    * `blog.xn--55qx5d.cn` key to the SAME registrable domain
    * (`<x>.xn--55qx5d.cn`), where the plain form keys each spelling in
    * its own form (two domains for one wire identity — under-merged
    * caps/mixes in any corpus carrying IRIs next to wire URLs). The
    * output is always the ACE form. Opt-in rather than the default
    * because the plain form's output-follows-input behavior is the
    * simplest cross-engine contract. ORACLE-GATED since r15: the
    * `url_psl_domain_ascii` row replays the per-label canonicalization
    * in DuckDB over a precomputed label map (the psl_lines twin-column
    * precedent — DuckDB has no IDNA codec, so conversions ship as aux
    * data while the split/map/reassemble/PSL algorithm replays
    * engine-independently), merging unicode, punycode and MIXED
    * spellings — including the UTS-46 deviation case faß.de ≠ fass.de. */
  def registrableDomainPslAscii(host: Column,
                                trie: PslTrie = PslFullTrie): Column =
    toCol(PslDomain(graft.functions.IdnAscii(strippedHost(host)), trie))

  /** The GENERATED-EXPRESSION form of [[registrableDomainPsl]]: per
    * rule one endswith/equality probe, the prevailing length a
    * greatest() over the probes, the slice arithmetic on the label
    * array — one row-local expression, zero joins. Semantically
    * identical to the trie form (the parity spec drives both over
    * every rule class); the expression grows LINEARLY in |rules|, so
    * it is honest only at fixture-sized rule sets — at the full list's
    * ~9.5k rules the tree is ~40k nodes, past the optimizer-cost and
    * 64KB-codegen territory (measured, SCALE_r13 §1). Kept as the
    * measurement baseline and the independent second implementation
    * backing the spec. */
  def registrableDomainPslGen(host: Column,
                              rules: Seq[PslRule] = PslFixture): Column = {
    val h0 = regexp_replace(
      regexp_replace(lower(host), ":[0-9]+$", ""), "\\.+$", "")
    // LET-BIND the stripped host before the probe fan-out: the match
    // references the host ~2|rules| times, and inlining the caller's
    // host expression (often itself a regex parse chain) into every
    // probe multiplies both the optimizer's tree and the per-row work
    // by |rules| — measured 54 s → 1.0 s at sf0.01.
    bind1(h0)(h => pslMatch(h, withPunycodeTwins(rules)))
  }

  private def pslMatch(h: Column, rules: Seq[PslRule]): Column = {
    def ends(s: String): Column =
      (h === s) || h.endsWith("." + s)
    // candidate public-suffix label counts; 1 = the default rule. A
    // wildcard's star must consume a REAL label, so its probe is
    // endsWith-only — the bare parent (host == 'kawasaki.jp' under
    // '*.kawasaki.jp') is NOT matched by the wildcard
    val normal = rules.filterNot(_.exception).map { r =>
      if (r.wildcard)
        when(h.endsWith("." + r.suffix), lit(r.labels + 1))
          .otherwise(lit(1))
      else when(ends(r.suffix), lit(r.labels)).otherwise(lit(1))
    }
    val best = greatest(lit(1) +: normal: _*)
    // exceptions prevail; ties (nested exceptions) to the longest
    val exc = rules.filter(_.exception).map(r =>
      when(ends(r.suffix), lit(r.labels - 1)).otherwise(lit(null)))
    val psLabels =
      if (exc.isEmpty) best
      else coalesce(greatest(exc :+ lit(null).cast("int"): _*), best)
    val labels = split(h, "\\.")
    val n = size(labels)
    when(h === "", lit(null).cast("string"))
      .when(h.rlike("^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$"), h)
      .when(n <= psLabels, lit(null).cast("string"))
      .otherwise(array_join(
        slice(labels, n - psLabels, psLabels + lit(1)), "."))
  }

  /** [[registrableDomainPsl]] straight from a raw URL (NULL when the
    * URL does not parse) — the PSL-exact per-domain cap / mixing key,
    * on the FULL committed list by default. */
  def urlDomainPsl(url: Column,
                   trie: PslTrie = PslFullTrie): Column =
    bind1(url) { u =>
      when(scheme(u) === "", lit(null).cast("string"))
        .otherwise(registrableDomainPsl(normHost(u), trie))
    }

  /** [[urlDomainPsl]] over the ACE-canonicalized host
    * ([[registrableDomainPslAscii]]) — ONE key per wire identity for
    * corpora mixing IRI and punycode URL spellings. */
  def urlDomainPslAscii(url: Column,
                        trie: PslTrie = PslFullTrie): Column =
    bind1(url) { u =>
      when(scheme(u) === "", lit(null).cast("string"))
        .otherwise(registrableDomainPslAscii(normHost(u), trie))
    }

  /** The PSL keying host of a raw URL — [[normHost]] with port and
    * trailing FQDN dots stripped, lowercased; NULL when the URL does
    * not parse. EXACTLY the host string every `registrableDomainPsl*`
    * entry point resolves (pre-IdnAscii for the ascii form) — public
    * so oracles and spelling-audit queries can key on the same form
    * the domain extraction consumed. */
  def strippedUrlHost(url: Column): Column = bind1(url) { u =>
    when(scheme(u) === "", lit(null).cast("string"))
      .otherwise(toCol(strippedHost(normHost(u))))
  }
}
