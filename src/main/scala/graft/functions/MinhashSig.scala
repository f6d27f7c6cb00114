package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole MinHash signature of a document as ONE row-local expression:
  * lowercase, whitespace-split, word-n-gram shingles, per-shingle
  * xxhash64, k per-seed family hashes, running minima — all inside the
  * projection, so signature computation is SHUFFLE-FREE. The relational
  * form ([[graft.ops.Dedup.minhashSignaturesRelational]]) pays an
  * explode of every shingle occurrence through a per-document window
  * (the lag-based shingle builder) plus a groupBy — two exchanges of
  * |corpus shingle rows| that this expression deletes outright; at a
  * 100 TB corpus the signatures now ride the scan.
  *
  * Bit-compatibility is the load-bearing property: every hash goes
  * through the SAME catalyst XXH64 primitives the column-level
  * `xxhash64` uses, composed in the same child order (a string child
  * folds as hashUTF8String(s, 42); `xxhash64(h, seed)` folds as
  * hashInt(seed, hashLong(h, 42))), lowercasing via UTF8String (locale-
  * independent, unlike java.lang.String), splitting via the same
  * regex. MinhashEquivalenceSpec pins array-exact equality against the
  * relational form, unicode and whitespace edges included.
  *
  * A document with fewer than `n` words has no shingle and yields NULL
  * (the relational form simply produces no row — callers filter).
  *
  * CodegenFallback: the per-row work is a string-building loop with no
  * profitable codegen form; falling back costs the enclosing projection
  * its whole-stage fusion but removes two shuffles, which dominates at
  * any scale.
  */
case class MinhashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1 && k >= 1, s"need n >= 1 and k >= 1, got n=$n k=$k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"$prettyName expects a string column, got " +
        child.dataType.simpleString)

  override def nullSafeEval(t: Any): Any = {
    val words = t.asInstanceOf[UTF8String].toLowerCase.toString
      .split(graft.core.Ws.Plus, -1)
    if (words.length < n) return null
    val sig = Array.fill(k)(Long.MaxValue)
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
      val h = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
      val hl = XXH64.hashLong(h, 42L) // per-shingle prefix of the family fold
      var s = 0
      while (s < k) {
        val fh = XXH64.hashInt(s, hl)
        if (fh < sig(s)) sig(s) = fh
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): MinhashSig =
    copy(child = c)
}
