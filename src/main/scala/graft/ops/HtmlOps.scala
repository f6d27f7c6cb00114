package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The chain's sections, separable so the anchor-marking variant
    * ([[markedText]]) can splice its marker steps between element
    * removal and tag stripping while sharing every byte of the rest. */
  private val StripSteps: Seq[Step] = Seq(
    Step(re = true, s"(?is)<script\\b[^>]*>.*?</script[$WsB]*>", ""),
    Step(re = true, s"(?is)<style\\b[^>]*>.*?</style[$WsB]*>", ""),
    Step(re = true, "(?s)<!--.*?-->", ""))
  private val TagSteps: Seq[Step] = Seq(
    Step(re = true,
      s"(?is)</?(${BlockTags.mkString("|")})\\b[^>]*>", "\n"),
    Step(re = true, "(?s)</?[a-zA-Z!?][^>]*>", ""))
  private val TextSteps: Seq[Step] = Seq(
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

  /** The extraction chain, in application order. */
  val Steps: Seq[Step] = StripSteps ++ TagSteps ++ TextSteps

  private def applySteps(steps: Seq[Step])(html: Column): Column =
    steps.foldLeft(html) { (c, s) =>
      if (s.re) regexp_replace(c, s.pattern, s.replacement)
      else replace(c, lit(s.pattern), lit(s.replacement))
    }

  private def stepsSql(steps: Seq[Step])(expr: String): String =
    steps.foldLeft(expr) { (e, s) =>
      if (s.re)
        s"regexp_replace($e, ${sqlLit(s.pattern)}, " +
          s"${sqlLit(s.replacement)}, 'g')"
      else s"replace($e, ${sqlLit(s.pattern)}, ${sqlLit(s.replacement)})"
    }

  /** Extracted block text of an HTML column — NULL in, NULL out; plain
    * prose (a WET body, a text/plain payload) passes through modulo
    * whitespace canonicalization. All built-in codegen'd expressions
    * (`regexp_replace` + literal `replace`), no UDFs. */
  def htmlToText(html: Column): Column = applySteps(Steps)(html)

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
  def htmlToTextSql(expr: String): String = stepsSql(Steps)(expr)

  // ---------------- main-content (boilerplate) selection ----------------
  // Production curation recipes (RefinedWeb/trafilatura, FineWeb) do
  // not stop at tag-stripping: nav bars, footers and cookie banners
  // survive extraction as short all-link lines that poison dedup keys
  // and quality stats. The standard bounded remedy is per-LINE link
  // density — the fraction of a line's extracted characters that came
  // from anchor text — with high-density lines dropped. Everything
  // here is regex/translate-expressible, so the DuckDB oracle replays
  // the whole pipeline (the `html_main` row).

  /** Anchor-span markers: `<a …>` becomes U+0001 and `</a>` U+0002
    * BEFORE tag stripping, so the extracted text carries exact anchor
    * spans as zero-width-ish control chars (excluded from all char
    * counts, stripped from the final output). Pre-existing control
    * chars 01/02 in the input are deleted first — a page cannot forge
    * spans. */
  val MarkOpen = "\u0001"
  val MarkClose = "\u0002"

  /** [[Steps]] with anchor marking spliced between element removal and
    * tag stripping — shares every other step byte-for-byte. */
  val MarkedSteps: Seq[Step] =
    Step(re = true, s"[$MarkOpen$MarkClose]", "") +: (StripSteps ++ Seq(
      Step(re = true, "(?is)<a\\b[^>]*>", MarkOpen),
      Step(re = true, s"(?is)</a[$WsB]*>", MarkClose)) ++
      TagSteps ++ TextSteps)

  /** [[htmlToText]] with anchor spans marked — the input to per-line
    * link-density scoring. */
  def markedText(html: Column): Column = applySteps(MarkedSteps)(html)

  /** DuckDB replay of [[markedText]]. */
  def markedTextSql(expr: String): String = stepsSql(MarkedSteps)(expr)

  /** Per-line span accounting, pinned PER LINE (anchor spans may cross
    * line boundaries when a block tag sits inside the anchor): a span
    * runs from U+0001 to the next U+0002 or LINE END, and a U+0002
    * with no opener on its line closes a span carried in from above —
    * its line-start prefix counts as linked. Expressed as two
    * deletions whose survivors are the UNLINKED characters; both
    * patterns are Java∩RE2 (`\z`, no lookaround), shared verbatim with
    * the oracle. Declared envelope: a MARKER-FREE interior line of an
    * anchor that spans 3+ lines scores unlinked (the per-line rule
    * carries no cross-line state — bounded work per line, exact
    * SQL replay; such anchors are block-wrapping wrappers whose
    * interior is usually the prose worth keeping anyway). */
  val CarryRe = s"^[^$MarkOpen]*$MarkClose"
  val SpanRe = s"$MarkOpen[^$MarkClose]*(?:$MarkClose|\\z)"

  /** Default [[mainContent]] thresholds — named so the oracle twin
    * interpolates the same values (the quality_c4 constants rule). */
  val DefaultMaxLinkDensity = 0.5
  val DefaultMinChars = 1

  /** Line-density main-content selection over `df`: per document
    * (`idCol`), the lines of [[markedText]] score
    * `linked / total` extracted chars; a line survives iff
    * `total >= minChars` and `linked <= maxLinkDensity * total`
    * (IEEE double product — bit-identical cross-engine). Returns one
    * row per document: (idCol, n_lines, n_lines_kept, text_chars,
    * link_chars, text_main — surviving lines in order, markers
    * stripped).
    *
    * Shape at 100 TB: the scan-riding projection computes the marked
    * extraction once; posexplode fans out to bounded per-line rows
    * (codegen'd translate/regexp projections — no interpreted
    * higher-order functions); ONE exchange keyed by `idCol`
    * re-assembles documents (map-side partial aggregation applies to
    * the counts; the line payload rides the shuffle once). */
  def mainContent(df: DataFrame, idCol: String, htmlCol: String,
                  maxLinkDensity: Double = DefaultMaxLinkDensity,
                  minChars: Int = DefaultMinChars): DataFrame = {
    val marks = MarkOpen + MarkClose
    val lines = df.select(col(idCol),
      posexplode(split(markedText(col(htmlCol)), "\n")).as(Seq("pos", "l")))
    val total = length(translate(col("l"), marks, ""))
    val unlinked = length(translate(
      regexp_replace(regexp_replace(col("l"), CarryRe, ""), SpanRe, ""),
      marks, ""))
    lines
      .select(col(idCol), col("pos"), col("l"),
        total.as("total"), (total - unlinked).as("linked"))
      .withColumn("keep", col("total") >= minChars &&
        col("linked").cast("double") <=
          lit(maxLinkDensity) * col("total").cast("double"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("keep").cast("long")).as("n_lines_kept"),
        sum(col("total").cast("long")).as("text_chars"),
        sum(col("linked").cast("long")).as("link_chars"),
        array_join(transform(array_sort(collect_list(
          when(col("keep"),
            struct(col("pos"), translate(col("l"), marks, "").as("t"))))),
          x => x.getField("t")), "\n").as("text_main"))
  }
}
