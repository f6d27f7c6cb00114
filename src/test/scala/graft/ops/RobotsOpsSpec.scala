package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** RFC 9309 semantics, each clause isolated: grouping of consecutive
  * user-agent lines, exact-token-else-star selection with group
  * merging, longest-match precedence with allow winning ties,
  * wildcard/anchor translation, empty-disallow, comments/case/CRLF
  * tolerance, and the unmatched-URL default. */
class RobotsOpsSpec extends SparkSpec {
  import spark.implicits._

  private def verdicts(robots: Seq[(String, String)],
                       urls: Seq[(String, String)],
                       agent: String = "graftbot")
      : Map[(String, String), (Boolean, Option[String])] = {
    val r = RobotsOps.rules(robots.toDF("host", "txt"), agent)
    RobotsOps.evaluate(urls.toDF("host", "path"), r)
      .collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getBoolean(2), Option(x.getString(3))))).toMap
  }

  test("longest match wins; allow beats disallow on ties; unmatched " +
      "URLs default to allowed; empty disallow is an allow-all") {
    val robots = Seq(("h", Seq(
      "User-agent: *",
      "Disallow: /private/",
      "Allow: /private/open/",
      "Disallow: /p",
      "Allow: /p").mkString("\n")))
    val v = verdicts(robots, Seq(
      ("h", "/private/x.html"), ("h", "/private/open/y"),
      ("h", "/p"), ("h", "/other")))
    assert(v(("h", "/private/x.html")) == ((false, Some("/private/"))))
    assert(v(("h", "/private/open/y")) ==
      ((true, Some("/private/open/"))))
    // /p matches Allow:/p and Disallow:/p — equal octets, allow wins
    assert(v(("h", "/p")) == ((true, Some("/p"))))
    assert(v(("h", "/other")) == ((true, None)))
    // a host with ONLY an empty Disallow has no rules at all
    val v2 = verdicts(Seq(("e", "User-agent: *\nDisallow:")),
      Seq(("e", "/anything")))
    assert(v2(("e", "/anything")) == ((true, None)))
  }

  test("group selection: the exact product token shadows the star " +
      "group entirely; same-selector groups merge") {
    val robots = Seq(("h", Seq(
      "User-agent: graftbot",
      "Disallow: /tmp/",
      "User-agent: *",
      "Disallow: /",
      "User-agent: GRAFTBOT",
      "Disallow: /cache/").mkString("\n")))
    val v = verdicts(robots, Seq(
      ("h", "/tmp/z"), ("h", "/cache/q"), ("h", "/open")))
    // the * group's Disallow:/ does NOT apply; both graftbot groups do
    assert(v(("h", "/tmp/z"))._1 == false)
    assert(v(("h", "/cache/q"))._1 == false)
    assert(v(("h", "/open")) == ((true, None)))
    // and with no matching token, the star group applies
    val v2 = verdicts(robots, Seq(("h", "/open")), agent = "otherbot")
    assert(v2(("h", "/open")) == ((false, Some("/"))))
  }

  test("consecutive user-agent lines head ONE group") {
    val robots = Seq(("h", Seq(
      "User-agent: graftbot",
      "User-agent: otherbot",
      "Disallow: /shared/",
      "User-agent: thirdbot",
      "Disallow: /third/").mkString("\n")))
    val v = verdicts(robots, Seq(("h", "/shared/x"), ("h", "/third/x")))
    assert(v(("h", "/shared/x"))._1 == false)
    assert(v(("h", "/third/x"))._1 == true) // thirdbot's group not ours
  }

  test("wildcards and anchors: * spans octets, trailing $ anchors, " +
      "mid-pattern $ and regex specials are literals") {
    val robots = Seq(("h", Seq(
      "User-agent: *",
      "Disallow: /*.pdf$",
      "Disallow: /a+b/",
      "Disallow: /x$y/").mkString("\n")))
    val v = verdicts(robots, Seq(
      ("h", "/files/doc.pdf"), ("h", "/files/doc.pdfx"),
      ("h", "/a+b/c"), ("h", "/aab/c"), ("h", "/x$y/z")))
    assert(v(("h", "/files/doc.pdf"))._1 == false)  // anchored match
    assert(v(("h", "/files/doc.pdfx"))._1 == true)  // $ anchored
    assert(v(("h", "/a+b/c"))._1 == false)          // '+' literal
    assert(v(("h", "/aab/c"))._1 == true)           // not regex '+'
    assert(v(("h", "/x$y/z"))._1 == false)          // mid-$ literal
  }

  test("parse tolerance: comments, key case, CRLF, surrounding " +
      "whitespace; non-matching keys ignored") {
    val robots = Seq(("h",
      "# robots for h\r\nUSER-AGENT: *  # inline\r\nCrawl-delay: 10\r\n" +
        "DISALLOW:   /secret/   \r\nSitemap: https://h/s.xml\r\n"))
    val v = verdicts(robots, Seq(("h", "/secret/a"), ("h", "/open")))
    assert(v(("h", "/secret/a"))._1 == false)
    assert(v(("h", "/open"))._1 == true)
  }

  test("the offline-audit seam: a crawled WARC drop evaluated against " +
      "robots snapshots — the fetched page that violates its host's " +
      "rules is flagged, the compliant one passes") {
    val res = getClass.getResource("/warc/fixture_html.warc").getPath
    val docs = graft.sources.WarcSource.documents(spark, res)
      .select(col("url"),
        UrlOps.strippedUrlHost(col("url")).as("host"),
        coalesce(nullif(regexp_extract(col("url"),
          "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1), lit("")),
          lit("/")).as("path"))
    val robots = Seq(("research.example.org",
      "User-agent: *\nDisallow: /notes/winter$\nAllow: /notes/")).toDF(
      "host", "txt")
    val audit = RobotsOps.evaluate(
      docs.select(col("host"), col("path")).distinct(),
      RobotsOps.rules(robots, "graftbot"))
      .collect().map(r => r.getString(1) -> r.getBoolean(2)).toMap
    // the HTML page's exact path is disallowed (anchored rule); the
    // .txt sibling under /notes/ rides the broader allow
    assert(audit("/notes/winter") == false)
    assert(audit("/notes/winter.txt") == true)
  }

  test("evaluate: an equal-length same-directive tie resolves to the " +
      "lexicographically smallest pattern — never row_number-arbitrary") {
    val robots = Seq(("h",
      "User-agent: *\nDisallow: /a*\nDisallow: /ab\n"))
    val v = verdicts(robots, Seq(("h", "/ab")))
    assert(v(("h", "/ab")) == ((false, Some("/a*"))))
  }

  test("directives: crawl-delay is group-scoped (selected group wins, " +
      "max of survivors, NULL on garbage); sitemaps are host-global " +
      "and ordered; a rule line still splits user-agent runs") {
    val robots = Seq(
      // named group (delay 1) shadows the star group (delay 10); the
      // Disallow between the two user-agent lines is what splits them
      ("a", "User-agent: graftbot\nCrawl-delay: 1\nDisallow: /tmp/\n" +
        "User-agent: *\nCrawl-delay: 10\nDisallow: /\n"),
      // merged same-selector star groups: max(2, 7) = 7
      ("b", "User-agent: *\nCrawl-delay: 2\nDisallow: /x\n\n" +
        "User-agent: *\nCrawl-delay: 7\n"),
      // unparseable delay; sitemap mid-group is harvested host-globally
      ("c", "User-agent: *\nSitemap: /first.xml\nCrawl-delay: fast\n" +
        "Disallow: /y\nSitemap: /second.xml\n"),
      // nothing to harvest
      ("d", "User-agent: *\nDisallow: /z\n")).toDF("host", "txt")
    val got = RobotsOps.directives(robots, "graftbot").collect()
      .map(r => r.getString(0) ->
        ((Option(r.get(1)), r.getString(2), r.getLong(3)))).toMap
    assert(got("a") == ((Some(1.0), "", 0L)))
    assert(got("b") == ((Some(7.0), "", 0L)))
    assert(got("c") == ((None, "/first.xml /second.xml", 2L)))
    assert(got("d") == ((None, "", 0L)))
  }

  test("directives: a sitemap line does NOT split a user-agent run " +
      "(host-global lines sit outside grouping)") {
    val robots = Seq(("h",
      "User-agent: graftbot\nSitemap: /s.xml\nUser-agent: otherbot\n" +
        "Crawl-delay: 4\n")).toDF("host", "txt")
    // graftbot and otherbot still head ONE group — its delay applies
    val got = RobotsOps.directives(robots, "graftbot").collect()(0)
    assert(Option(got.get(1)) == Some(4.0) && got.getLong(3) == 1L)
  }

  test("patternRegex: the translation is RE2/Java-safe and exact") {
    val got = Seq("/*.pdf$", "/a+b/", "/x$y/", "/p")
      .toDF("pattern")
      .select(RobotsOps.patternRegex(col("pattern"))).collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("^/.*\\.pdf$", "^/a\\+b/", "^/x\\$y/", "^/p"))
  }
}
