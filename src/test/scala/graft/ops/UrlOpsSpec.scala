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
