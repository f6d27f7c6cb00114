package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-label IDNA/punycode (ACE) canonicalization of a hostname —
  * ICU UTS #46 nontransitional `toASCII` on each non-ASCII label,
  * ASCII labels (and so ASCII-only hosts, the overwhelming majority)
  * pass through untouched on a zero-allocation fast path.
  *
  * Why this exists: crawl corpora carry the SAME IDN domain in two
  * spellings — the on-the-wire punycode form (`blog.xn--55qx5d.cn`)
  * and the display/IRI unicode form (`blog.公司.cn`). Keying on the
  * raw host under-merges them into two domains. Canonicalizing to the
  * wire form first gives one key, and because it works per label it
  * also canonicalizes MIXED-form hosts (one label unicode, another
  * punycode) — the case single-pass whole-host converters miss and the
  * one the PSL twin-rule envelope (PslDomain) excludes.
  *
  * Semantics (UTS #46 NONTRANSITIONAL processing — what modern
  * browsers and registries implement, NOT `java.net.IDN`'s IDNA2003,
  * whose Nameprep folds the deviation characters and would over-merge
  * DISTINCT registrations):
  *  - each label through ICU `IDNA.getUTS46Instance(
  *    NONTRANSITIONAL_TO_ASCII).labelToASCII`, lowercased
  *    (already-punycode and plain-ASCII labels are fixpoints);
  *  - deviation characters keep their own registrations: `faß` →
  *    `xn--fa-hia` (a DIFFERENT domain from `fass` since IDNA2008),
  *    final sigma `ς` → `xn--3xa` (≠ `σ`'s `xn--4xa`), ZWJ/ZWNJ
  *    encode rather than vanish — IdnAsciiSpec pins all three;
  *  - a label the algorithm rejects (bad punycode, ACE > 63 octets,
  *    UTS-46 hyphen rule) keeps its original form (the
  *    [[graft.ops.UrlOps.punycodeTwin]] posture — garbage stays
  *    observable, never throws mid-scan);
  *  - null → null, '' → '', label structure ('.' count) preserved.
  * ONE conversion implementation serves this expression, the rule-twin
  * insertion at trie build, and the oracle's aux twin column —
  * [[IdnAscii.asciiLabel]].
  *
  * Row-local, zero shuffles; codegen'd via one static call so the
  * enclosing projection keeps whole-stage fusion. */
case class IdnAscii(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "idn_ascii"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column")

  override protected def nullSafeEval(v: Any): Any =
    IdnAscii.toAsciiHost(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cls = IdnAscii.getClass.getName.stripSuffix("$")
      s"""
      ${ev.value} = $cls.toAsciiHost($v);
      """
    })

  override protected def withNewChildInternal(c: Expression): IdnAscii =
    copy(child = c)
}

object IdnAscii {

  /** The shared UTS #46 converter — nontransitional ToASCII, the
    * registry/browser wire semantics (IDNA2008-compatible deviation
    * handling). ICU `IDNA` instances are immutable and thread-safe;
    * ONE instance serves every executor thread. icu4j ships on the
    * Spark classpath (Spark itself depends on it) — no new dependency. */
  private val Uts46: com.ibm.icu.text.IDNA =
    com.ibm.icu.text.IDNA.getUTS46Instance(
      com.ibm.icu.text.IDNA.NONTRANSITIONAL_TO_ASCII)

  /** One label to its ACE form: ASCII labels unchanged; labels the
    * UTS-46 algorithm flags (any `IDNA.Info` error — bad punycode,
    * ACE > 63 octets, hyphen-3-4) keep their original form. The single
    * conversion implementation — rule twins and host canonicalization
    * must agree bit-for-bit or twin-rule matching breaks. */
  def asciiLabel(lab: String): String =
    if (isAscii(lab)) lab
    else {
      val info = new com.ibm.icu.text.IDNA.Info
      val out = Uts46.labelToASCII(lab, new java.lang.StringBuilder, info)
      if (info.hasErrors) lab
      else out.toString.toLowerCase(java.util.Locale.ROOT)
    }

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x80) return false
      i += 1
    }
    true
  }

  /** Whole stripped host, per label; ASCII hosts return the INPUT
    * object — `UTF8String.isFullAscii` tests the raw bytes, so the
    * dominant path allocates NOTHING (a `toString` before the test
    * would silently tax every row of a 100 TB scan for the benefit of
    * the rare IDN row). Called from generated code. */
  def toAsciiHost(host: UTF8String): UTF8String = {
    if (host == null) return null
    if (host.isFullAscii) return host
    UTF8String.fromString(
      host.toString.split("\\.", -1).map(asciiLabel).mkString("."))
  }
}
