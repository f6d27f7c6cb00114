package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.UrlOps

/** The trie-compiled PSL expression vs the generated-expression form:
  * two independent implementations of the pinned publicsuffix.org
  * algorithm, driven over a host battery SYNTHESIZED FROM EVERY
  * FIXTURE RULE (suffix itself, one and two extra labels, star-fed
  * variants) plus the garbage classes — bit-identical or the spec
  * names the host. Plus full-list hand-checks, the build-time
  * envelope, and the IPv4 probe's regex parity. */
class PslDomainSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixtureTrie = UrlOps.trieOf(UrlOps.PslFixture)

  test("trie ≡ generated expression on every fixture rule's host family") {
    // per rule: the bare suffix, +1 label, +2 labels — covers rule-is-
    // host (NULL), plain registrable, and sub-registrable for normal,
    // wildcard (star consuming the extra label) and exception classes;
    // IDN rules additionally contribute their punycode-twin host family
    // (the on-the-wire form — both implementations insert the twin
    // rules, so the battery drives them too)
    val hosts = UrlOps.PslFixture.flatMap { r =>
      (r.suffix +: UrlOps.punycodeTwin(r.suffix).toList).flatMap(s =>
        Seq(s, s"alpha.$s", s"beta.alpha.$s"))
    } ++ Seq(
      "", "localhost", "corp.example", "a.corp.example",
      "10.1.2.3", "999.1.2.3", "1.2.3.4.5", "10.1.2",
      "a..com", ".com", "x.y.z.w.v.co.uk")
    val df = hosts.distinct.toDF("host")
    val out = df.select(col("host"),
        UrlOps.registrableDomainPslGen(col("host"), UrlOps.PslFixture)
          .as("gen"),
        UrlOps.registrableDomainPsl(col("host"), fixtureTrie).as("trie"))
      .collect()
    val diffs = out.filter(r =>
      Option(r.getString(1)) != Option(r.getString(2)))
    assert(diffs.isEmpty, diffs.map(r =>
      s"${r.getString(0)}: gen=${r.getString(1)} trie=${r.getString(2)}")
      .mkString("; "))
    assert(out.length == hosts.distinct.size)
  }

  test("trie ≡ generated at full-list-prefix scale (2,000 rules) — " +
      "coverage beyond the fixture's rule count") {
    val rules = UrlOps.PslFull.take(2000)
    val trie = UrlOps.trieOf(rules)
    // host family over a rule sample spanning the prefix (every 40th
    // rule keeps the battery small while touching all rule shapes the
    // prefix carries), plus the garbage classes
    val hosts = rules.grouped(40).map(_.head).toSeq.flatMap { r =>
      Seq(r.suffix, s"alpha.${r.suffix}", s"beta.alpha.${r.suffix}")
    } ++ Seq("", "a.b.unlisted", "10.0.0.1", "x..y")
    val out = hosts.distinct.toDF("host").select(
        UrlOps.registrableDomainPslGen(col("host"), rules).as("gen"),
        UrlOps.registrableDomainPsl(col("host"), trie).as("trie"))
      .collect()
    assert(out.forall(r => Option(r.getString(0)) == Option(r.getString(1))),
      out.filter(r => Option(r.getString(0)) != Option(r.getString(1)))
        .take(5).mkString(";"))
  }

  test("full list: hand-checked hosts incl. a unicode (IDN) rule") {
    def d(h: String): String = {
      val r = Seq(h).toDF("host")
        .select(UrlOps.registrableDomainPsl(col("host"))).collect()
      if (r.head.isNullAt(0)) null else r.head.getString(0)
    }
    assert(d("myblog.blogspot.com") == "myblog.blogspot.com")
    assert(d("assets.b.s3.amazonaws.com") == "b.s3.amazonaws.com")
    assert(d("a.b.example.co.uk") == "example.co.uk")
    assert(d("x.shop.anything.ck") == "shop.anything.ck")
    assert(d("sub.www.ck") == "www.ck")
    assert(d("media.city.kawasaki.jp") == "city.kawasaki.jp")
    assert(d("a.ward.kawasaki.jp") == "a.ward.kawasaki.jp")
    assert(d("kawasaki.jp") == "kawasaki.jp")
    assert(d("co.uk") == null)
    assert(d("com") == null)
    // the list carries IDN rules as unicode labels (公司.cn is a real
    // ICANN rule) — matched as-is
    assert(d("foo.公司.cn") == "foo.公司.cn")
    assert(d("公司.cn") == null)
    // ...AND in the on-the-wire punycode form via the build-time ACE
    // twin (xn--55qx5d.cn = 公司.cn): real crawls carry IDN hosts as
    // xn--, which before the twin insertion silently fell through to
    // the default rule (registrable domain one label too short)
    assert(d("foo.xn--55qx5d.cn") == "foo.xn--55qx5d.cn")
    assert(d("xn--55qx5d.cn") == null)
    // a unicode-IDN TLD (中国 = xn--fiqs8s), both forms
    assert(d("site.中国") == "site.中国")
    assert(d("site.xn--fiqs8s") == "site.xn--fiqs8s")
    assert(d("xn--fiqs8s") == null)
  }

  test("punycode twins: every IDN fixture rule resolves both host " +
      "forms to form-consistent, label-identical domains") {
    val idn = UrlOps.PslFixture.filter(r =>
      UrlOps.punycodeTwin(r.suffix).isDefined)
    assert(idn.nonEmpty, "fixture lost its IDN rules")
    val trie = UrlOps.trieOf(UrlOps.PslFixture)
    idn.foreach { r =>
      val twin = UrlOps.punycodeTwin(r.suffix).get
      val hosts = Seq(s"alpha.${r.suffix}", s"alpha.$twin")
      val out = hosts.toDF("host")
        .select(UrlOps.registrableDomainPsl(col("host"), trie))
        .collect().map(x => if (x.isNullAt(0)) null else x.getString(0))
      // same label count under both forms, each in its own host's form
      assert(out(0) == s"alpha.${r.suffix}", s"${r.suffix}: ${out(0)}")
      assert(out(1) == s"alpha.$twin", s"$twin: ${out(1)}")
    }
    // synthetic wildcard + exception IDN classes (the published list
    // has none today — the twin insertion must still cover them if a
    // revision adds one): *.例.jp with !www.例.jp
    val synth = UrlOps.trieOf(Seq(
      UrlOps.PslRule("例.jp", wildcard = true, exception = false),
      UrlOps.PslRule("www.例.jp", wildcard = false, exception = true)))
    val ace = UrlOps.punycodeTwin("例.jp").get // xn--fsq.jp
    def d2(h: String): String = {
      val r = Seq(h).toDF("host")
        .select(UrlOps.registrableDomainPsl(col("host"), synth)).collect()
      if (r.head.isNullAt(0)) null else r.head.getString(0)
    }
    assert(d2(s"a.shop.$ace") == s"a.shop.$ace")
    assert(d2(s"shop.$ace") == null)      // star consumed 'shop'
    assert(d2(s"sub.www.$ace") == s"www.$ace") // exception prevails
    assert(d2("a.shop.例.jp") == "a.shop.例.jp") // unicode unchanged
  }

  test("build envelope: full list loads; non-leading star rejected") {
    assert(UrlOps.PslFull.size > 9000)
    assert(UrlOps.PslFull.count(_.wildcard) > 50)
    assert(UrlOps.PslFull.count(_.exception) > 0)
    // every IDN rule in the committed artifact converts CLEANLY: its
    // twin is full-ASCII (a label IDN.toASCII rejects would keep its
    // unicode form and silently leave that rule's xn-- hosts on the
    // default rule — if a future list revision trips this, the
    // conversion flags need revisiting, loudly not silently)
    val idn = UrlOps.PslFull.filter(r => r.suffix.exists(_ >= 0x80))
    assert(idn.size > 400, s"expected 400+ IDN rules, got ${idn.size}")
    val dirty = idn.flatMap(r => UrlOps.punycodeTwin(r.suffix) match {
      case None => Some(r.suffix -> "no twin")
      case Some(t) if t.exists(_ >= 0x80) => Some(r.suffix -> t)
      case _ => None
    })
    assert(dirty.isEmpty, dirty.take(5).mkString("; "))
    // every star in the published artifact is leftmost — the build
    // asserts it, so a future list revision that breaks the envelope
    // fails loudly at compile-the-trie time, not silently at match time
    UrlOps.PslFullTrie // builds without throwing
    val ex = intercept[IllegalArgumentException] {
      PslTrie.build(Seq(("a.*.b", false, false)))
    }
    assert(ex.getMessage.contains("non-leading"))
  }

  test("IPv4 probe matches the generated form's anchored regex") {
    val cases = Seq("1.2.3.4" -> true, "999.888.77.6" -> true,
      "1.2.3" -> false, "1.2.3.4.5" -> false, "a.2.3.4" -> false,
      "1..3.4" -> false, "1.2.3." -> false, ".1.2.3" -> false,
      "" -> false, "1234" -> false, "01.02.03.04" -> true)
    cases.foreach { case (h, want) =>
      assert(PslTrie.isIpv4(h) == want, h)
      assert(h.matches("[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+") == want,
        s"regex twin disagrees on $h")
    }
  }
}
