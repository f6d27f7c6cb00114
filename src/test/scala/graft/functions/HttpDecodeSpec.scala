package graft.functions

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** Charset-aware payload decode: resolution precedence, alias
  * mapping, the REPLACE contract, the no-envelope gate — and the JVM
  * pin of every `warc_charset` oracle scenario (the tailText
  * constants the DuckDB twin selects MUST be what the JVM decoder
  * actually produces from the tail bytes, or the "constants instead
  * of aux" oracle design silently rots). */
class HttpDecodeSpec extends AnyFunSuite {

  private def hexBytes(h: String): Array[Byte] =
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  private def decoded(payload: Array[Byte], isHttp: Boolean)
      : (String, String, String) = {
    val r = HttpDecode.decode(payload, isHttp)
    (r.getUTF8String(0).toString, r.getUTF8String(1).toString,
      r.getUTF8String(2).toString)
  }

  private def http(headerCt: String, body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: $headerCt\r\n\r\n"
      .getBytes(StandardCharsets.ISO_8859_1)) ++ body

  test("precedence: BOM > header charset > meta prescan > UTF-8") {
    // header only
    val (_, t1, c1) = decoded(http("text/html; charset=windows-1252",
      hexBytes("93")), isHttp = true)
    assert((t1, c1) == (("“", "windows-1252")))
    // BOM beats a contradicting header
    val (_, t2, c2) = decoded(http("text/html; charset=shift_jis",
      hexBytes("EFBBBF") ++ "hé".getBytes(StandardCharsets.UTF_8)),
      isHttp = true)
    assert((t2, c2) == (("hé", "utf-8")))
    // meta fires only when the header carries no resolvable label
    val (_, t3, c3) = decoded(http("text/html",
      "<meta charset=gb2312>x".getBytes(StandardCharsets.ISO_8859_1)
        ++ hexBytes("D6D0")), isHttp = true)
    assert(c3 == "gbk" && t3.endsWith("中"))
    // nothing anywhere: utf-8
    val (_, _, c4) = decoded(http("text/html", "plain".getBytes),
      isHttp = true)
    assert(c4 == "utf-8")
  }

  test("the WHATWG aliases that matter at corpus scale resolve; " +
      "unknown labels fall through; resolution is case-blind") {
    assert(HttpDecode.resolveLabel("ISO-8859-1").get.name
      == "windows-1252")
    assert(HttpDecode.resolveLabel("Latin1").get.name == "windows-1252")
    assert(HttpDecode.resolveLabel("GB2312").get.name == "GBK")
    assert(HttpDecode.resolveLabel("SJIS").get.name == "Shift_JIS")
    assert(HttpDecode.resolveLabel("utf8").get.name == "UTF-8")
    assert(HttpDecode.resolveLabel("x-klingon").isEmpty)
    assert(HttpDecode.resolveLabel("").isEmpty)
    // a syntactically ILLEGAL charset name must not throw mid-scan
    assert(HttpDecode.resolveLabel("??bad name??").isEmpty)
  }

  test("no \\r\\n\\r\\n envelope separator: head is EMPTY (no " +
      "content-type sniff — the r15-ADVICE gate) and the body passes " +
      "through whole") {
    val raw = "content-type: text/html\nno real envelope here"
      .getBytes(StandardCharsets.ISO_8859_1)
    val (h, t, c) = decoded(raw, isHttp = true)
    assert(h == "" && c == "utf-8")
    assert(t == "content-type: text/html\nno real envelope here")
  }

  test("malformed bytes REPLACE, never throw; UTF-16 BOMs decode; " +
      "non-http payloads still meta-sniff") {
    val (_, t1, c1) = decoded(http("text/plain", hexBytes("FF80FE")),
      isHttp = true)
    assert(c1 == "utf-8" && t1 == "���")
    val (_, t2, c2) = decoded(hexBytes("FFFE68006900"), isHttp = false)
    assert((t2, c2) == (("hi", "utf-16le")))
    val (_, t3, c3) = decoded(hexBytes("FEFF00680069"), isHttp = false)
    assert((t3, c3) == (("hi", "utf-16be")))
    val (_, t4, c4) = decoded(
      ("<meta charset=windows-1252>" + "x").getBytes(
        StandardCharsets.ISO_8859_1) ++ hexBytes("97"), isHttp = false)
    assert(c4 == "windows-1252" && t4.endsWith("—"))
  }

  test("the meta prescan stops at 1024 body bytes") {
    val pad = ("y" * 1040).getBytes(StandardCharsets.ISO_8859_1)
    val late = pad ++ "<meta charset=shift_jis>".getBytes ++ hexBytes("93FA")
    val (_, _, c) = decoded(late, isHttp = false)
    assert(c == "utf-8")
    val early = "<meta charset=shift_jis>".getBytes ++ hexBytes("93FA")
    assert(decoded(early, isHttp = false)._3 == "shift_jis")
  }

  test("every warc_charset oracle scenario's tailText constant IS the " +
      "JVM decode of its tail bytes under the scenario's resolved " +
      "charset (the twin's selected constants cannot rot)") {
    import graft.queries.OracleQueries.{CsCases, CsEnvPre, CsEnvPost}
    val expectCs = Seq("windows-1252", "shift_jis", "gbk",
      "windows-1252", "utf-8", "utf-16le", "utf-8", "utf-8",
      "windows-1252", "utf-8", "windows-1252")
    assert(CsCases.length == expectCs.length)
    CsCases.zip(expectCs).zipWithIndex.foreach { case ((c, cs), i) =>
      val body = c.prefix.getBytes(StandardCharsets.ISO_8859_1) ++
        hexBytes(c.tailHex)
      val payload =
        if (c.http) (CsEnvPre + c.header + CsEnvPost)
          .getBytes(StandardCharsets.ISO_8859_1) ++ body
        else body
      val (_, text, charset) = decoded(payload, isHttp = c.http)
      assert(charset == cs, s"case $i charset")
      assert(text == c.prefix + c.tailText, s"case $i text")
    }
  }
}
