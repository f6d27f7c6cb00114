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
  *    (sitemap, crawl-delay etc. pass through unharvested);
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

  /** Rule rows of the group RFC 9309 selects for `agent`:
    * (host, directive ∈ {allow,disallow}, pattern, pat_len).
    * `robots` carries one row per robots.txt document:
    * (host string, txt string). */
  def rules(robots: DataFrame, agent: String): DataFrame = {
    val byPos = Window.partitionBy("host").orderBy("pos")
    val parsed = robots
      .select(col("host"),
        posexplode(split(col("txt"), "\\r?\\n")).as(Seq("pos", "line")))
      .select(col("host"), col("pos"),
        trim(regexp_replace(col("line"), "#.*$", "")).as("l"))
      .select(col("host"), col("pos"),
        lower(trim(regexp_extract(col("l"), "^([^:]+):", 1))).as("k"),
        trim(regexp_extract(col("l"), "^[^:]+:(.*)$", 1)).as("v"))
      .where(col("k").isin("user-agent", "allow", "disallow"))
    val grouped = parsed
      .withColumn("boundary",
        (col("k") === "user-agent" &&
          coalesce(lag(col("k"), 1).over(byPos), lit("")) =!= "user-agent")
          .cast("int"))
      .withColumn("grp", sum(col("boundary")).over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val agents = grouped.where(col("k") === "user-agent")
      .select(col("host"), col("grp"), lower(col("v")).as("ua"))
    // §2.2.1 selection: exact product token when any group names it,
    // else the '*' groups; groups with the same selector merge
    val hostHasExact = agents
      .groupBy("host")
      .agg(max((col("ua") === agent.toLowerCase).cast("int"))
        .as("has_exact"))
    val chosen = agents.join(hostHasExact, "host")
      .where((col("has_exact") === 1 && col("ua") === agent.toLowerCase) ||
        (col("has_exact") === 0 && col("ua") === "*"))
      .select(col("host"), col("grp")).distinct()
    grouped.where(col("k").isin("allow", "disallow") && col("v") =!= "")
      .join(chosen, Seq("host", "grp"))
      .select(col("host"), col("k").as("directive"),
        col("v").as("pattern"), length(col("v")).as("pat_len"))
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
    val byUrl = Window.partitionBy(col("host"), col("path"))
      .orderBy(col("pat_len").desc_nulls_last,
        when(col("directive") === "allow", 0).otherwise(1))
    joined
      .withColumn("rn", row_number().over(byUrl))
      .where(col("rn") === 1)
      .select(col("host"), col("path"),
        coalesce(col("directive") === "allow", lit(true)).as("allowed"),
        col("pattern").as("winner_pattern"),
        col("directive").as("winner_directive"))
  }
}
