package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt parsing and per-URL allow/deny evaluation — RFC 9309
  * (Robots Exclusion Protocol), the crawl-politeness gate every
  * production ingest runs BEFORE fetching (and re-runs offline to
  * audit a crawl drop against the robots snapshots it shipped with).
  *
  * Pinned semantics (RFC 9309; spec-pinned in RobotsOpsSpec):
  *  - lines are `key: value` with `#` comments stripped; keys
  *    case-insensitive; CRLF and LF both accepted; only
  *    `user-agent` / `allow` / `disallow` participate in matching
  *    (`crawl-delay` and `sitemap` are harvested by [[directives]],
  *    never by the matching path);
  *  - consecutive `user-agent` lines head ONE group (a user-agent
  *    line starts a new group only when the previous parsed line is
  *    not itself a user-agent line — §2.2.1's grouping);
  *  - group selection: all groups naming the crawler's product token
  *    (exact, case-insensitive) when any exists, else all `*` groups
  *    (§2.2.1 — groups with the same selector MERGE);
  *  - rule matching: a pattern matches path PREFIXES, `*` matches
  *    any octet run, a TRAILING `$` anchors end-of-path (a
  *    mid-pattern `$` is a literal — the RFC gives `$` meaning only
  *    at the end); the empty pattern matches nothing (§2.2.2's bare
  *    "Disallow:" = allow-all signal, dropped at parse);
  *  - precedence: the most specific match wins = MOST OCTETS in the
  *    pattern; an allow/disallow TIE resolves to allow (§2.2.2);
  *    a URL matching no rule is allowed.
  * Out of envelope (documented): percent-encoding equivalence
  * between pattern and path (compare in one encoding regime), and
  * query strings (participate only if the caller includes them in
  * `path`).
  *
  * Shape at 100 TB: parsing is per-DOCUMENT relational work (explode
  * lines, one window per host for group ids — robots files are KB,
  * line counts bounded); evaluation is an equi-join on host (the
  * rule table is per-host data — broadcast when small, shuffle-keyed
  * by host otherwise) with the per-(url, rule) fan-out bounded by
  * rules-per-host, then one bounded window per (host, path) for the
  * longest-match argmax. Every step is relational — the DuckDB
  * oracle (`robots_eval`) re-derives parse, grouping, selection,
  * translation and precedence independently. */
object RobotsOps {

  /** A rule pattern column translated to a full RE2/Java-safe regex:
    * every regex special escaped EXCEPT `*` (→ `.*`), then a
    * trailing escaped `$` un-escaped back into the end anchor; `^`
    * prepended (patterns match path prefixes). THE one translation —
    * [[evaluate]] and the spec both read it. */
  def patternRegex(pattern: Column): Column = {
    val esc = regexp_replace(pattern,
      "([\\\\.^$+?(){}\\[\\]|])", "\\\\$1")
    val star = replace(esc, lit("*"), lit(".*"))
    val body = when(star.endsWith("\\$"),
      concat(star.substr(lit(1), length(star) - 2), lit("$")))
      .otherwise(star)
    concat(lit("^"), body)
  }

  /** `txt` → one (host, pos, k, v) row per parseable `key: value`
    * line: comments stripped, key lowercased, both sides trimmed,
    * CRLF/LF accepted. NO key filter — each consumer keeps the key
    * set that participates in ITS semantics ([[rules]]: the three
    * matching keys; [[directives]]: plus crawl-delay/sitemap). */
  private def parsedLines(robots: DataFrame): DataFrame = robots
    .select(col("host"),
      posexplode(split(col("txt"), "\\r?\\n")).as(Seq("pos", "line")))
    .select(col("host"), col("pos"),
      trim(regexp_replace(col("line"), "#.*$", "")).as("l"))
    .select(col("host"), col("pos"),
      lower(trim(regexp_extract(col("l"), "^([^:]+):", 1))).as("k"),
      trim(regexp_extract(col("l"), "^[^:]+:(.*)$", 1)).as("v"))

  /** §2.2.1 grouping over an already-key-filtered [[parsedLines]]
    * frame: a user-agent line opens a new group only when the
    * previous KEPT line is not itself a user-agent line — so which
    * keys the caller kept defines which lines can split a run of
    * user-agent lines (rules: allow/disallow; directives: those plus
    * crawl-delay). Adds (boundary, grp). */
  private def grouping(parsed: DataFrame): DataFrame = {
    val byPos = Window.partitionBy("host").orderBy("pos")
    parsed
      .withColumn("boundary",
        (col("k") === "user-agent" &&
          coalesce(lag(col("k"), 1).over(byPos), lit("")) =!= "user-agent")
          .cast("int"))
      .withColumn("grp", sum(col("boundary")).over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** §2.2.1 group selection over a [[grouping]] frame: the (host, grp)
    * pairs whose selector is the crawler's exact product token when any
    * group on the host names it, else the `*` groups; same-selector
    * groups MERGE (multiple rows per host). */
  private def chosenGroups(grouped: DataFrame, agent: String): DataFrame = {
    val agents = grouped.where(col("k") === "user-agent")
      .select(col("host"), col("grp"), lower(col("v")).as("ua"))
    val hostHasExact = agents
      .groupBy("host")
      .agg(max((col("ua") === agent.toLowerCase).cast("int"))
        .as("has_exact"))
    agents.join(hostHasExact, "host")
      .where((col("has_exact") === 1 && col("ua") === agent.toLowerCase) ||
        (col("has_exact") === 0 && col("ua") === "*"))
      .select(col("host"), col("grp")).distinct()
  }

  /** Rule rows of the group RFC 9309 selects for `agent`:
    * (host, directive ∈ {allow,disallow}, pattern, pat_len).
    * `robots` carries one row per robots.txt document:
    * (host string, txt string). */
  def rules(robots: DataFrame, agent: String): DataFrame = {
    val parsed = parsedLines(robots)
      .where(col("k").isin("user-agent", "allow", "disallow"))
    val grouped = grouping(parsed)
    grouped.where(col("k").isin("allow", "disallow") && col("v") =!= "")
      .join(chosenGroups(grouped, agent), Seq("host", "grp"))
      .select(col("host"), col("k").as("directive"),
        col("v").as("pattern"), length(col("v")).as("pat_len"))
  }

  /** The two non-rule directive families the same parse has in hand
    * but [[rules]] deliberately ignores — politeness scheduling and
    * discovery both key on them:
    *
    *  - `crawl-delay` (de-facto standard — Bing/Yandex; not in
    *    RFC 9309): GROUP-scoped like allow/disallow, so the value is
    *    taken from the groups §2.2.1 selects for `agent`, with the
    *    SAME consecutive-user-agent grouping computed over
    *    {user-agent, allow, disallow, crawl-delay} lines (a rule line
    *    between two user-agent lines splits them here exactly as it
    *    does for [[rules]]). Same-selector groups merge; multiple
    *    surviving values resolve to the MAXIMUM (the conservative
    *    politeness bound — wait as long as any selected group asks);
    *    an unparseable value (try_cast) contributes NULL;
    *  - `sitemap` (sitemaps.org protocol): HOST-GLOBAL by its own
    *    spec — independent of user-agent groups, so sitemap lines
    *    neither join a group nor split a user-agent run; harvested in
    *    document order.
    *
    * One row per `robots` host: (host, crawl_delay double — NULL when
    * absent/unparseable, sitemaps string — the ordered URLs joined
    * with one space, '' when none, n_sitemaps long). */
  def directives(robots: DataFrame, agent: String): DataFrame = {
    val parsed = parsedLines(robots).where(col("k").isin(
      "user-agent", "allow", "disallow", "crawl-delay", "sitemap"))
    val sitemaps = parsed.where(col("k") === "sitemap" && col("v") =!= "")
      .groupBy("host")
      .agg(array_sort(collect_list(struct(col("pos"), col("v"))))
        .as("sm"))
      .select(col("host"),
        array_join(transform(col("sm"), _.getField("v")), " ")
          .as("sitemaps"),
        size(col("sm")).cast("long").as("n_sitemaps"))
    val grouped = grouping(parsed.where(col("k") =!= "sitemap"))
    val delays = grouped.where(col("k") === "crawl-delay")
      .join(chosenGroups(grouped, agent), Seq("host", "grp"))
      .groupBy("host")
      .agg(max(col("v").try_cast("double")).as("crawl_delay"))
    robots.select(col("host")).distinct()
      .join(delays, Seq("host"), "left")
      .join(sitemaps, Seq("host"), "left")
      .select(col("host"), col("crawl_delay"),
        coalesce(col("sitemaps"), lit("")).as("sitemaps"),
        coalesce(col("n_sitemaps"), lit(0L)).as("n_sitemaps"))
  }

  /** Per-URL verdict over a [[rules]] table: (host, path, allowed,
    * winner_pattern, winner_directive) — `allowed` true when no rule
    * matches (and for allow winners), winner columns NULL when
    * unmatched. `urls` must be DISTINCT on (host, path) — each
    * distinct URL gets exactly one verdict row.
    *
    * The join is an equi-join on host with the regex match as a join
    * condition, LEFT so unmatched URLs keep one NULL row; the
    * longest-match/tie-to-allow argmax is one bounded window per
    * (host, path). */
  def evaluate(urls: DataFrame, ruleTable: DataFrame): DataFrame = {
    val r = ruleTable.withColumn("rx", patternRegex(col("pattern")))
      .select(col("host").as("r_host"), col("directive"),
        col("pattern"), col("pat_len"), col("rx"))
    val joined = urls.join(r,
      urls("host") === r("r_host") &&
        regexp_like(urls("path"), r("rx")), "left")
    // final `pattern` key: two same-length rules with the SAME directive
    // (where the RFC is indifferent) would otherwise make winner_pattern
    // row_number-arbitrary — the verdict must be a function of the data
    val byUrl = Window.partitionBy(col("host"), col("path"))
      .orderBy(col("pat_len").desc_nulls_last,
        when(col("directive") === "allow", 0).otherwise(1),
        col("pattern"))
    joined
      .withColumn("rn", row_number().over(byUrl))
      .where(col("rn") === 1)
      .select(col("host"), col("path"),
        coalesce(col("directive") === "allow", lit(true)).as("allowed"),
        col("pattern").as("winner_pattern"),
        col("directive").as("winner_directive"))
  }
}
