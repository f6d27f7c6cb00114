package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC canonicalization — the text-normalization pass a corpus
  * runs BEFORE any hash-based dedup or fingerprinting: "é" composed
  * (U+00E9) and decomposed (U+0065 U+0301) are the same text to a
  * reader but different bytes to xxhash64/MinHash, so an unnormalized
  * corpus silently under-deduplicates any text that mixes sources with
  * different normalization conventions (copy-paste chains, macOS file
  * names, some OCR output).
  *
  * Row-local expression (zero shuffles). Both this (java.text.Normalizer)
  * and DuckDB's `nfc_normalize` implement the Unicode-standard NFC
  * algorithm, so results agree wherever the two runtimes carry the same
  * Unicode data version — pinned by the `text_nfc` oracle row on the
  * corpus and by the spec on composed/decomposed fixtures. Fast path:
  * `Normalizer.isNormalized` is O(n) with no allocation, and real text
  * is overwhelmingly already NFC. Null → null. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column")

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) v
    else UTF8String.fromString(
      Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}
