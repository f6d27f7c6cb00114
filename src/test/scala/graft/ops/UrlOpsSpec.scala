package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** URL normalization + registrable domain: every pinned rule
  * hand-checked, malformed input surfacing, PSL-lite domain cases, and
  * the composition the normalizer exists for — canonical-key exact
  * dedup merging raw variants of the same resource. */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String = {
    val r = Seq(u).toDF("url").select(UrlOps.normalize(col("url"))).collect()
    if (r.head.isNullAt(0)) null else r.head.getString(0)
  }

  private def dom(u: String): String = {
    val r = Seq(u).toDF("url").select(UrlOps.urlDomain(col("url"))).collect()
    if (r.head.isNullAt(0)) null else r.head.getString(0)
  }

  test("normalization rules, one by one") {
    // case + default port + tracking + trailing slash
    assert(norm("HTTP://WWW.Example.COM:80/A/B/?utm_source=x&id=7") ==
      "http://www.example.com/A/B?id=7") // path CASE is preserved
    // :443 under https; other ports kept
    assert(norm("https://a.example.co.uk:443/p//") ==
      "https://a.example.co.uk/p")
    assert(norm("https://a.example.net:8443/x?a=1&b=2") ==
      "https://a.example.net:8443/x?a=1&b=2")
    // fragment dropped; empty path becomes /
    assert(norm("http://example.com#top") == "http://example.com/")
    // all-tracking query drops its '?'
    assert(norm("http://e.com/p?utm_a=1&fbclid=z&gclid=q") ==
      "http://e.com/p")
    // param order preserved, only tracking removed
    assert(norm("http://e.com/p?z=2&utm_x=1&a=1") == "http://e.com/p?z=2&a=1")
    // :80 NOT stripped under https (not that scheme's default)
    assert(norm("https://e.com:80/") == "https://e.com:80/")
    // unparseable -> NULL
    assert(norm("not a url 5") == null)
    assert(norm("example.com/path") == null)
  }

  test("registrable domain: structural, second-level suffix, IP, " +
      "single label, port strip") {
    assert(dom("http://www.example.com/x") == "example.com")
    assert(dom("https://a.b.news.example.co.uk/") == "example.co.uk")
    assert(dom("http://sub.site.org:8080/") == "site.org")
    assert(dom("http://10.1.2.3:8080/x") == "10.1.2.3")
    assert(dom("http://localhost/x") == "localhost")
    assert(dom("bad") == null)
  }

  private def pslDom(u: String): String = {
    val r = Seq(u).toDF("url")
      .select(UrlOps.urlDomainPsl(col("url"))).collect()
    if (r.head.isNullAt(0)) null else r.head.getString(0)
  }

  test("PSL registrable domain: every rule class of the fixture, " +
      "hand-checked against the publicsuffix.org algorithm") {
    // private multi-label suffixes the lite heuristic cannot see
    assert(pslDom("https://myblog.blogspot.com/p") ==
      "myblog.blogspot.com")
    assert(pslDom("https://assets.bucket.s3.amazonaws.com/k") ==
      "bucket.s3.amazonaws.com")
    // plain 2-level ccTLD suffix (lite agrees here)
    assert(pslDom("http://a.b.example.co.uk/") == "example.co.uk")
    // wildcard *.ck: one extra label joins the public suffix
    assert(pslDom("http://shop.anything.ck/") == "shop.anything.ck")
    assert(pslDom("http://x.shop.anything.ck/") == "shop.anything.ck")
    // exception !www.ck prevails over the wildcard
    assert(pslDom("http://www.ck/") == "www.ck")
    assert(pslDom("http://sub.www.ck/") == "www.ck")
    // *.kawasaki.jp with !city.kawasaki.jp
    assert(pslDom("https://media.city.kawasaki.jp/") ==
      "city.kawasaki.jp")
    assert(pslDom("http://a.ward.kawasaki.jp/") == "a.ward.kawasaki.jp")
    // kawasaki.jp itself: the wildcard needs a label before it, so the
    // 'jp' rule prevails and kawasaki.jp is the registrable domain
    assert(pslDom("http://kawasaki.jp/") == "kawasaki.jp")
    // unlisted TLD -> the PSL default rule (rightmost label)
    assert(pslDom("http://intra.corp.example/") == "corp.example")
    // a host that IS a public suffix has no registrable domain
    assert(pslDom("http://com/") == null)
    assert(pslDom("http://co.uk/") == null)
    // single unlisted label = a public suffix under the default rule
    // (PSL-exact posture; the lite form keys localhost on itself)
    assert(pslDom("http://localhost/") == null)
    // IPv4 stays its own domain; port and trailing dot stripped
    assert(pslDom("http://10.1.2.3:8080/x") == "10.1.2.3")
    assert(pslDom("HTTP://WWW.Example.COM.:80/x") == "example.com")
    // REPEATED trailing dots strip too (one-dot-only stripping would
    // leave 'example.com.' keying on garbage); an all-dots host is
    // empty after the strip -> NULL, both forms
    assert(pslDom("http://www.example.com../x") == "example.com")
    assert(dom("http://www.example.com../x") == "example.com")
    assert(pslDom("http://../x") == null)
    assert(dom("http://../x") == null)
    // unparseable -> NULL
    assert(pslDom("nonsense") == null)
  }

  test("PSL parser: comments, blanks, wildcard and exception markers") {
    val rules = UrlOps.parsePsl(Iterator(
      "// comment", "", "com", "  co.uk  ", "*.ck", "!www.ck"))
    assert(rules == Seq(
      UrlOps.PslRule("com", wildcard = false, exception = false),
      UrlOps.PslRule("co.uk", wildcard = false, exception = false),
      UrlOps.PslRule("ck", wildcard = true, exception = false),
      UrlOps.PslRule("www.ck", wildcard = false, exception = true)))
    assert(rules.map(_.labels) == Seq(1, 2, 1, 2))
    // the committed fixture loads and carries every rule class
    val fx = UrlOps.PslFixture
    assert(fx.exists(_.wildcard) && fx.exists(_.exception) &&
      fx.exists(r => r.labels >= 3 && !r.exception))
  }

  test("composition: normalized URL as the canonical exact-dedup key " +
      "merges raw variants of one resource") {
    val docs = Seq(
      (1L, "HTTP://Example.COM:80/a/?utm_source=feed"),
      (2L, "http://example.com/a"),
      (3L, "http://example.com/a#section"),
      (4L, "http://example.com/b"),
      (5L, "nonsense")).toDF("doc_id", "url")
    val keyed = docs
      .withColumn("url_norm", UrlOps.normalize(col("url")))
      .where(col("url_norm").isNotNull)
    val groups = Dedup.exactGroups(keyed, "doc_id", "url_norm")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // variants 1-3 collapse to one group keeping doc 1; doc 4 alone
    assert(groups == Map(3L -> 1L, 1L -> 4L))
    // raw-string dedup would have merged NOTHING
    val raw = Dedup.exactGroups(docs, "doc_id", "url")
      .collect()
    assert(raw.forall(_.getLong(1) == 1L))
  }
}
