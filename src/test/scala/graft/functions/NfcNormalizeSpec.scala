package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TextMetrics

/** NFC canonicalization: composed/decomposed equivalence, the dedup
  * failure it prevents, pass-through fast path, edge conventions. */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val composed = "caf\u00e9"     // e-acute, one codepoint
  private val decomposed = "cafe\u0301"  // e + combining acute

  private def nfcOf(texts: String*): Seq[String] =
    texts.toDF("t").select(TextMetrics.nfc(col("t")))
      .collect().map(_.getString(0)).toSeq

  test("decomposed text canonicalizes to the composed form") {
    assert(composed != decomposed) // different bytes...
    assert(nfcOf(composed, decomposed) == Seq(composed, composed))
  }

  test("the dedup failure NFC prevents: fingerprints agree only after " +
    "normalization") {
    val raw = Seq(composed, decomposed).toDF("text")
    val rawPrints = raw.select(TextMetrics.fingerprint(col("text")))
      .collect().map(_.getLong(0)).toSet
    assert(rawPrints.size == 2) // un-normalized: NOT duplicates
    val nfcPrints = raw
      .select(TextMetrics.fingerprint(TextMetrics.nfc(col("text"))))
      .collect().map(_.getLong(0)).toSet
    assert(nfcPrints.size == 1) // normalized: exact duplicates
  }

  test("already-NFC text (including plain ASCII) passes through " +
    "unchanged") {
    val texts = Seq("plain ascii text", composed, "", "  spaced  ")
    assert(nfcOf(texts: _*) == texts)
  }

  test("null propagates; hangul and full-width forms stay NFC-stable") {
    val got = Seq(Option("한글"), None, Option("ＡＢ"))
      .toDF("t").select(TextMetrics.nfc(col("t")))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(Some("한글"), None, Some("ＡＢ")))
  }

  test("agrees with java.text.Normalizer on a mixed fixture set") {
    val fixtures = Seq(composed, decomposed, "Ångström",
      "Å", "plain", "tabs\tand\nnewlines")
    val expected = fixtures.map(
      java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(nfcOf(fixtures: _*) == expected)
  }
}
