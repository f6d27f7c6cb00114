package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the stage every production crawl-curation
  * recipe (CCNet, C4, RefinedWeb, FineWeb, Dolma) runs between WARC
  * ingest and the quality filters. A Common Crawl response body is raw
  * HTML, not prose: fed directly to [[TextMetrics.gopherFlags]] /
  * langid / repetition scoring, the markup dominates the token stream
  * (mean word length blown out by attribute runs, stopword counts
  * diluted, symbol ratios saturated) and the rules reject essentially
  * every real page. Extraction first makes the funnel true end to end
  * from a crawl container (HtmlOpsSpec pins exactly that:
  * `gopherFlags.keep` accepts the extracted prose of a page whose raw
  * form it rejects).
  *
  * The transform is a fixed chain of literal/regexp replacements —
  * ENTIRELY row-local, codegen'd, zero shuffles, rides the scan at
  * 100 TB. Every pattern stays inside the Java-regex ∩ RE2 common
  * subset ([[TextMetrics.EmailRe]] rule: no lookaround, no backrefs,
  * explicit whitespace classes per [[graft.core.Ws]]), so the DuckDB
  * oracle replays extraction verbatim: [[htmlToTextSql]] generates the
  * SQL form from the SAME step table — one source of truth, two
  * engines (the `text_extract` CORRECTNESS row).
  *
  * Chain (in order):
  *  1. `<script>`/`<style>` elements removed WITH their content
  *     (case-insensitive, multi-line; separate passes — RE2 has no
  *     backreferences to pair open/close tags in one pattern);
  *  2. HTML comments removed;
  *  3. block-level tags (p, div, br, li, tr, h1-6, title, …) become
  *     newlines — block structure survives as line structure;
  *  4. remaining tag-shaped spans `</?[a-zA-Z!?]…>` removed (covers
  *     inline tags, `<!DOCTYPE>`, `<?xml?>`); a bare `<` or `>` in
  *     prose ("a < b") is NOT tag-shaped and survives;
  *  5. the fixed named/numeric entity set decoded ONCE (`&lt; &gt;
  *     &quot; &#39; &apos; &nbsp; &amp;` — `&amp;` deliberately last,
  *     so `&amp;lt;` decodes to the literal text `&lt;`, not `<`);
  *  6. whitespace canonicalized: horizontal runs → one space, spaces
  *     trimmed around newlines, 3+ newlines → one blank line, ends
  *     trimmed.
  *
  * Declared envelope (documented, spec-pinned, NOT handled): entities
  * beyond the fixed set pass through as text; CDATA sections lose
  * their brackets like any tag-shaped span; an UNCLOSED `<script>`
  * degrades to tag-stripping (its code text survives as prose — the
  * quality rules then judge it); `<pre>` loses interior whitespace
  * like all text; lone-CR line endings collapse to spaces, not
  * newlines; and the strip is SINGLE-PASS, not run to fixpoint — an
  * adversarial splice like `<<b>word>` strips `<b>` and leaves the
  * tag-shaped residue `<word>` (found by the property spec's random
  * tag soup; iterating to fixpoint would make worst-case work
  * unbounded per row, and such constructs are not markup any
  * browser nests either — downstream quality rules judge the
  * residue as text). Pages needing a DOM (JS-rendered content,
  * srcset selection) are out of scope by design — this is the
  * bounded regex-expressible core, the cross-engine-replayable
  * contract. */
object HtmlOps {

  private val WsB = graft.core.Ws.Body // " \t\n\x0B\f\r" as escapes
  private val BlockTags = Seq(
    "p", "div", "br", "hr", "li", "ul", "ol", "dl", "dt", "dd",
    "tr", "td", "th", "table", "thead", "tbody", "tfoot",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
    "section", "article", "aside", "header", "footer", "nav", "main",
    "form", "fieldset", "figure", "figcaption", "address", "title")

  /** One replacement step: regex (`re = true`, global) or literal
    * substring (`re = false`). The SINGLE definition both engines
    * compile from. */
  final case class Step(re: Boolean, pattern: String, replacement: String)

  /** The extraction chain, in application order. */
  val Steps: Seq[Step] = Seq(
    Step(re = true, s"(?is)<script\\b[^>]*>.*?</script[$WsB]*>", ""),
    Step(re = true, s"(?is)<style\\b[^>]*>.*?</style[$WsB]*>", ""),
    Step(re = true, "(?s)<!--.*?-->", ""),
    Step(re = true,
      s"(?is)</?(${BlockTags.mkString("|")})\\b[^>]*>", "\n"),
    Step(re = true, "(?s)</?[a-zA-Z!?][^>]*>", ""),
    Step(re = false, "&lt;", "<"),
    Step(re = false, "&gt;", ">"),
    Step(re = false, "&quot;", "\""),
    Step(re = false, "&#39;", "'"),
    Step(re = false, "&apos;", "'"),
    Step(re = false, "&nbsp;", " "),
    Step(re = false, "&amp;", "&"),
    Step(re = true, "[ \\t\\x0B\\f\\r]+", " "),
    Step(re = true, " ?\\n ?", "\n"),
    Step(re = true, "\\n{3,}", "\n\n"),
    Step(re = true, s"^[$WsB]+", ""),
    Step(re = true, s"[$WsB]+$$", ""))

  /** Extracted block text of an HTML column — NULL in, NULL out; plain
    * prose (a WET body, a text/plain payload) passes through modulo
    * whitespace canonicalization. All built-in codegen'd expressions
    * (`regexp_replace` + literal `replace`), no UDFs. */
  def htmlToText(html: Column): Column =
    Steps.foldLeft(html) { (c, s) =>
      if (s.re) regexp_replace(c, s.pattern, s.replacement)
      else replace(c, lit(s.pattern), lit(s.replacement))
    }

  /** href patterns for [[extractLinks]] — double- and single-quoted
    * anchor hrefs, case-insensitive across tag and attribute, dotall
    * PLUS explicit whitespace classes around `=` so attributes may
    * genuinely span lines. Java∩RE2 subset (no lookaround/backrefs),
    * so two passes instead of one backreferenced quote group. The
    * attribute name is anchored by a PRECEDING whitespace character
    * (`\bhref` would also match `data-href`/`xlink:href` — '-' and
    * ':' are non-word, so the \b sits right before the h), and the
    * captured value excludes `<`/`>` so an UNTERMINATED quote fails
    * to match instead of swallowing every anchor until the next
    * stray quote (URLs carry those bracket characters only
    * percent-encoded). Declared envelope: UNQUOTED href values
    * (legal HTML5, rare in crawl HTML) and non-anchor link carriers
    * (`<link>`, `<area>`) are not harvested; hrefs inside
    * comments/scripts ARE (extraction runs over the RAW markup by
    * design — strip first if that matters). */
  private val HrefDq =
    s"(?is)<a\\b[^>]*[$WsB]href[$WsB]*=[$WsB]*\"([^\"<>]*)\""
  private val HrefSq =
    s"(?is)<a\\b[^>]*[$WsB]href[$WsB]*=[$WsB]*'([^'<>]*)'"

  /** All anchor hrefs of an HTML column, as an array (double-quoted
    * matches first, then single-quoted — a deterministic order both
    * engines replay; NULL in, NULL out). The crawl → link-graph seam:
    * compose with [[UrlOps.urlDomain]] / [[UrlOps.urlDomainPsl]] for
    * per-domain outlink counts (the `html_links` row), or
    * [[UrlOps.normalize]] for frontier keys. Row-local codegen'd
    * builtins, zero shuffles. */
  def extractLinks(html: Column): Column =
    concat(regexp_extract_all(html, lit(HrefDq), lit(1)),
      regexp_extract_all(html, lit(HrefSq), lit(1)))

  /** DuckDB replay of [[extractLinks]] over SQL expression `expr` —
    * generated from the same pattern constants. */
  def extractLinksSql(expr: String): String =
    s"list_concat(regexp_extract_all($expr, ${sqlLit(HrefDq)}, 1), " +
      s"regexp_extract_all($expr, ${sqlLit(HrefSq)}, 1))"

  /** SQL single-quoted literal of `s` — THE escaping rule for every
    * engine-generated DuckDB fragment (shared with the oracle-side
    * generators; one copy, or an escaping fix silently misses one). */
  private[graft] def sqlLit(s: String): String =
    "'" + s.replace("'", "''") + "'"

  // ------------------------- page metadata --------------------------
  // The three header signals curation stacks key on BEFORE any body
  // work: <title> (quality/dedup keys), <html lang> (language routing
  // ahead of content langid), and meta-robots noindex (politeness/
  // compliance — pages that ask to be excluded). Same discipline as
  // the chain: Java∩RE2 patterns, quote forms as separate passes
  // (no backrefs), attribute names anchored by preceding whitespace,
  // values excluding <> so malformed markup fails in place. Declared
  // envelope: first occurrence wins; attribute ORDER within a meta
  // tag is name-then-content or content-then-name (both patterns);
  // unquoted attribute values not matched.

  private val TitleRe = "(?is)<title\\b[^>]*>([^<]*)</title"
  private def langRe(q: String) =
    s"(?is)<html\\b[^>]*[$WsB]lang[$WsB]*=[$WsB]*$q([a-zA-Z-]{1,20})$q"
  private def robotsRe(q: String) =
    s"(?is)<meta\\b[^>]*[$WsB]name[$WsB]*=[$WsB]*${q}robots$q" +
      s"[^>]*[$WsB]content[$WsB]*=[$WsB]*$q([^<>$q]*)$q"
  private def robotsRevRe(q: String) =
    s"(?is)<meta\\b[^>]*[$WsB]content[$WsB]*=[$WsB]*$q([^<>$q]*)$q" +
      s"[^>]*[$WsB]name[$WsB]*=[$WsB]*${q}robots$q"

  /** First `<title>` text of the page ('' when absent — the
    * regexp_extract no-match convention both engines share); raw
    * inner text, entities NOT decoded (run [[htmlToText]] over it if
    * prose form is needed). */
  def htmlTitle(html: Column): Column =
    regexp_extract(html, TitleRe, 1)

  /** The `<html lang="…">` attribute, lowercased ('' when absent);
    * double- then single-quoted form. */
  def htmlLang(html: Column): Column =
    lower(when(regexp_extract(html, langRe("\""), 1) =!= "",
      regexp_extract(html, langRe("\""), 1))
      .otherwise(regexp_extract(html, langRe("'"), 1)))

  /** TRUE when a `<meta name="robots">` content carries `noindex`
    * (either attribute order, either quote form, case-insensitive) —
    * the exclusion-compliance flag. NULL html → false (concat_ws
    * absorbs NULLs in both engines, so no flag, not unknown — a page
    * that does not exist asks for nothing). */
  def htmlNoindex(html: Column): Column = {
    val content = Seq(robotsRe("\""), robotsRe("'"),
      robotsRevRe("\""), robotsRevRe("'"))
      .map(p => regexp_extract(html, p, 1))
    lower(concat_ws(" ", content: _*)).contains("noindex")
  }

  /** DuckDB replays of the metadata extractors over SQL expression
    * `expr` — generated from the same pattern constants. */
  def htmlTitleSql(expr: String): String =
    s"regexp_extract($expr, ${sqlLit(TitleRe)}, 1)"

  def htmlLangSql(expr: String): String = {
    val dq = s"regexp_extract($expr, ${sqlLit(langRe("\""))}, 1)"
    val sq = s"regexp_extract($expr, ${sqlLit(langRe("'"))}, 1)"
    s"lower(CASE WHEN $dq <> '' THEN $dq ELSE $sq END)"
  }

  def htmlNoindexSql(expr: String): String = {
    val parts = Seq(robotsRe("\""), robotsRe("'"),
      robotsRevRe("\""), robotsRevRe("'"))
      .map(p => s"regexp_extract($expr, ${sqlLit(p)}, 1)")
      .mkString(", ")
    s"contains(lower(concat_ws(' ', $parts)), 'noindex')"
  }

  /** The DuckDB replay of [[htmlToText]] over the SQL expression
    * `expr`, generated from [[Steps]] — the oracle cannot drift from
    * the engine because both read one table. DuckDB's regexp_replace
    * is single-occurrence by default, hence the explicit 'g'. */
  def htmlToTextSql(expr: String): String =
    Steps.foldLeft(expr) { (e, s) =>
      if (s.re)
        s"regexp_replace($e, ${sqlLit(s.pattern)}, " +
          s"${sqlLit(s.replacement)}, 'g')"
      else s"replace($e, ${sqlLit(s.pattern)}, ${sqlLit(s.replacement)})"
    }
}
