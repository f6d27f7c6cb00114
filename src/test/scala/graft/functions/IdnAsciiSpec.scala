package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.UrlOps

/** Per-label ACE canonicalization and the one-key-per-wire-identity
  * property it buys the PSL keying layer: unicode, punycode, and
  * MIXED-form spellings of one host all key to the same registrable
  * domain under `registrableDomainPslAscii`, where the plain form
  * keys each spelling in its own form (documented envelope). */
class IdnAsciiSpec extends SparkSpec {
  import spark.implicits._

  private def ascii(h: String): String = {
    val r = Seq(h).toDF("host").select(
      org.apache.spark.sql.graftshim.Internals.column(
        IdnAscii(org.apache.spark.sql.graftshim.Internals.expression(
          col("host"))))).collect()
    if (r.head.isNullAt(0)) null else r.head.getString(0)
  }

  test("per-label conversion: unicode → ACE, ASCII fixpoint, mixed " +
      "forms, garbage kept, structure preserved") {
    assert(ascii("blog.公司.cn") == "blog.xn--55qx5d.cn")
    assert(ascii("site.中国") == "site.xn--fiqs8s")
    // fixpoints: plain ASCII and already-punycode
    assert(ascii("example.co.uk") == "example.co.uk")
    assert(ascii("blog.xn--55qx5d.cn") == "blog.xn--55qx5d.cn")
    // MIXED-form host — each label independently canonicalized (the
    // case whole-host converters and the twin-rule envelope exclude)
    assert(ascii("公司.xn--fiqs8s") == "xn--55qx5d.xn--fiqs8s")
    // label structure preserved: empties stay empties
    assert(ascii("a..b") == "a..b")
    assert(ascii("") == "")
    // a label IDNA rejects (ACE form > 63 chars) keeps its original
    // form, never throws — and its neighbors still convert
    val longLab = "公" * 100
    assert(ascii(longLab + ".公司.cn") == longLab + ".xn--55qx5d.cn")
  }

  test("eval ≡ codegen path on the conversion battery") {
    // a filter forces the codegen'd predicate path; compare against
    // the collected projection values
    val hosts = Seq("blog.公司.cn", "example.co.uk", "公司.xn--fiqs8s",
      "a..b", "", "blog.xn--55qx5d.cn")
    val df = hosts.toDF("host")
    val proj = df.select(col("host"),
      org.apache.spark.sql.graftshim.Internals.column(
        IdnAscii(org.apache.spark.sql.graftshim.Internals.expression(
          col("host")))).as("a"))
    val viaProj = proj.collect().map(r => r.getString(0) -> r.getString(1))
    viaProj.foreach { case (h, a) =>
      assert(proj.where(col("host") === h && col("a") === a).count() == 1)
    }
  }

  test("one key per wire identity: unicode, punycode and mixed " +
      "spellings key to the SAME ACE registrable domain") {
    val spellings = Seq(
      "blog.公司.cn", "blog.xn--55qx5d.cn", "BLOG.公司.CN:8080",
      "blog.xn--55qx5d.cn.")
    val keys = spellings.toDF("host").select(
        UrlOps.registrableDomainPslAscii(col("host")).as("k"))
      .collect().map(_.getString(0)).toSet
    assert(keys == Set("blog.xn--55qx5d.cn"), keys.toString)
    // the plain form's documented behavior for contrast: each spelling
    // keys in its own form (output follows input)
    val plain = Seq("blog.公司.cn", "blog.xn--55qx5d.cn").toDF("host")
      .select(UrlOps.registrableDomainPsl(col("host")).as("k"))
      .collect().map(_.getString(0)).toSet
    assert(plain == Set("blog.公司.cn", "blog.xn--55qx5d.cn"))
    // URL level: IRI and wire spellings of one page → one domain key
    val urls = Seq("https://blog.公司.cn/a", "https://blog.xn--55qx5d.cn/b")
    val ukeys = urls.toDF("url").select(
        UrlOps.urlDomainPslAscii(col("url")).as("k"))
      .collect().map(_.getString(0)).toSet
    assert(ukeys == Set("blog.xn--55qx5d.cn"))
  }

  test("SQL surface: graft_idn_ascii and graft_psl_domain_ascii match " +
      "the Column forms") {
    GraftExtensions.register(spark)
    val hosts = Seq("blog.公司.cn", "Example.CO.UK:443", "公司.xn--fiqs8s",
      "foo.xn--55qx5d.cn").toDF("host")
    hosts.createOrReplaceTempView("idn_hosts")
    val viaSql = spark.sql("SELECT graft_idn_ascii(host) AS a, " +
        "graft_psl_domain_ascii(host) AS d FROM idn_hosts")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    val viaCol = hosts.select(
        org.apache.spark.sql.graftshim.Internals.column(IdnAscii(
          org.apache.spark.sql.graftshim.Internals.expression(
            col("host")))).as("a"),
        UrlOps.registrableDomainPslAscii(col("host")).as("d"))
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toSeq
    assert(viaSql == viaCol)
  }
}
