package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local shingle-hash machinery shared by the whole-document
  * fingerprint expressions ([[SimhashSig]], [[WinnowSig]]; [[MinhashSig]]
  * fuses its own family loop per shingle). Same construction as the
  * relational `shingleRowsPos` + column `xxhash64`: UTF8String
  * lowercase (locale-independent), `\s+` split, word n-grams joined by
  * one space, XXH64 with the engine seed — so the expression forms are
  * bit-compatible with the exploded forms, spec-pinned per expression.
  */
object ShingleExpressions {

  /** Positional shingle hashes in document order; null when the doc has
    * fewer than `n` words. */
  private[functions] def shingleHashes(t: UTF8String,
                                       n: Int): Array[Long] = {
    val words = t.toLowerCase.toString.split(graft.core.Ws.Plus, -1)
    if (words.length < n) return null
    val out = new Array[Long](words.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = n - 1
    while (i < words.length) {
      sb.setLength(0)
      var j = i - n + 1
      while (j <= i) {
        if (j > i - n + 1) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      out(i - n + 1) =
        XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
      i += 1
    }
    out
  }

  /** DISTINCT-shingle hashes (string-level distinct, mirroring the
    * relational `shingleRows(distinct = true)`), order preserved by
    * first occurrence; null when fewer than `n` words. */
  private[functions] def distinctShingleHashes(t: UTF8String,
                                               n: Int): Array[Long] = {
    val words = t.toLowerCase.toString.split(graft.core.Ws.Plus, -1)
    if (words.length < n) return null
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = n - 1
    while (i < words.length) {
      sb.setLength(0)
      var j = i - n + 1
      while (j <= i) {
        if (j > i - n + 1) sb.append(' ')
        sb.append(words(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); var p = 0
    while (it.hasNext) {
      out(p) = XXH64.hashUTF8String(UTF8String.fromString(it.next()), 42L)
      p += 1
    }
    out
  }
}

/** Distinct shingle hashes of a document as an array — the row-local
  * replacement for `shingleRows(distinct = true)` + `xxhash64` wherever
  * a consumer only needs the hash set (decontamination scans, overlap
  * joins): explode the array instead of paying the per-document window
  * shuffle the relational shingle builder needs. First-occurrence
  * order; null when the document has fewer than `n` words (explodes to
  * zero rows). */
/** POSITIONAL shingle hashes of a document as an array — element i is
  * the xxhash64 (seed 42, bit-compatible with the SQL builtin) of the
  * n-gram STARTING at 0-based token position i, in document order, one
  * element per window. The row-local replacement for the
  * `shingleRowsPos` window-lag builder wherever a consumer needs gram
  * positions (span detection, decontamination): `posexplode` yields
  * (start, hash) rows with ZERO shuffles, where the relational builder
  * pays a per-document window exchange of the whole corpus token
  * stream before its first filter. Null when the document has fewer
  * than `n` words (explodes to zero rows, matching the relational
  * form's empty window). */
case class PositionalShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "positional_shingle_hashes"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column")

  override def nullSafeEval(t: Any): Any = {
    val hs = ShingleExpressions
      .shingleHashes(t.asInstanceOf[UTF8String], n)
    if (hs == null) null else new GenericArrayData(hs)
  }

  override protected def withNewChildInternal(
      c: Expression): PositionalShingleHashes = copy(child = c)
}

case class DistinctShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "distinct_shingle_hashes"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column")

  override def nullSafeEval(t: Any): Any = {
    val hs = ShingleExpressions
      .distinctShingleHashes(t.asInstanceOf[UTF8String], n)
    if (hs == null) null else new GenericArrayData(hs)
  }

  override protected def withNewChildInternal(
      c: Expression): DistinctShingleHashes = copy(child = c)
}

/** SimHash fingerprint of a document as one row-local expression —
  * replaces explode(distinct shingles) + the SimHashAgg groupBy (an
  * exchange of the corpus shingle-row table) with a pure projection.
  * Voting semantics identical to [[graft.ops.SimHashAgg]]: bit j set
  * iff bit j was 1 in strictly more distinct shingle hashes than not.
  * Null for documents with fewer than `n` words (the relational form
  * yields no group). */
case class SimhashSig(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_sig"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column")

  override def nullSafeEval(t: Any): Any = {
    val hs = ShingleExpressions
      .distinctShingleHashes(t.asInstanceOf[UTF8String], n)
    if (hs == null) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < hs.length) {
      val h = hs(i); var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L; var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimhashSig =
    copy(child = c)
}

/** Winnowing (MOSS) fingerprint SET of a document as one row-local
  * expression — replaces the positional-shingle explode + per-document
  * sliding-window min + distinct (an exchange of the corpus shingle
  * rows) with a pure projection. Returns the distinct window minima
  * SORTED ascending; null when the document has no full window
  * (fewer than n + window - 1 words), which explodes to zero rows like
  * the relational form's absent doc. */
case class WinnowSig(child: Expression, n: Int, window: Int)
    extends UnaryExpression with CodegenFallback {
  require(window >= 1, s"window must be >= 1, got $window")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_sig"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column")

  override def nullSafeEval(t: Any): Any = {
    val hs =
      ShingleExpressions.shingleHashes(t.asInstanceOf[UTF8String], n)
    if (hs == null || hs.length < window) return null
    val fps = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + window <= hs.length) {
      var m = hs(i); var j = i + 1
      while (j < i + window) { if (hs(j) < m) m = hs(j); j += 1 }
      fps.add(m)
      i += 1
    }
    val out = new Array[Long](fps.size)
    val it = fps.iterator(); var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): WinnowSig =
    copy(child = c)
}
