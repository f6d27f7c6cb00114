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

  test("UTS-46 nontransitional envelope: deviation characters keep " +
      "their own registrations (≠ IDNA2003's Nameprep folding)") {
    // German sharp s: faß.de and fass.de are DIFFERENT registrations
    // since IDNA2008 — java.net.IDN (IDNA2003) would fold faß → fass,
    // over-merging them under one per-domain cap/dedup key
    assert(ascii("faß.de") == "xn--fa-hia.de")
    assert(ascii("fass.de") == "fass.de")
    assert(ascii("faß.de") != ascii("fass.de"))
    // Greek final sigma keeps its own code point (σ encodes xn--4xa)
    assert(ascii("ς") == "xn--3xa")
    assert(ascii("σ") == "xn--4xa")
    // ZWJ/ZWNJ encode rather than vanish (Nameprep deleted them,
    // merging visually-distinct joiner domains with their base form)
    assert(ascii("a‍b") == "xn--ab-m1t")
    assert(ascii("a‌b") == "xn--ab-j1t")
    assert(ascii("a‍b") != "ab")
    // and the wire form of a deviation host is a fixpoint, so the
    // one-key-per-wire-identity property holds for faß.de too
    assert(ascii("xn--fa-hia.de") == "xn--fa-hia.de")
  }

  test("eval ≡ codegen path on the conversion battery") {
    // CODEGEN_ONLY forces doGenCode (a broken static-call site cannot
    // hide behind interpreted fallback), NO_CODEGEN forces eval — the
    // two paths must agree value-for-value (the VectorExpressions
    // pattern)
    val hosts = Seq("blog.公司.cn", "example.co.uk", "公司.xn--fiqs8s",
      "a..b", "", "blog.xn--55qx5d.cn", null)
    val df = hosts.toDF("host")
    def run(): Seq[Option[String]] = df.select(
        org.apache.spark.sql.graftshim.Internals.column(
          IdnAscii(org.apache.spark.sql.graftshim.Internals.expression(
            col("host")))).as("a"))
      .collect().map(r => Option(r.getString(0))).toSeq
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    val gen = try run() finally
      spark.conf.unset("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run() finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(gen == interp)
    assert(gen(0) == Some("blog.xn--55qx5d.cn") && gen.last.isEmpty)
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
