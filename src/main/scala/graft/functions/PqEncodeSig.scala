package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Whole PQ code vector of an embedding as ONE row-local expression: the
  * trained codebook rides inside the expression as a literal
  * (S × k × D/S doubles — a few KB), so encoding is SHUFFLE-FREE and a
  * 100 TB embedding corpus encodes inside its own scan. The relational
  * form ([[graft.ops.Pq.encode]]) pays a broadcast-join row
  * amplification of k per subspace plus a corpus-keyed (id, sub) argmin
  * window — an exchange of S × |corpus| rows that this expression
  * deletes outright; it stays as the in-repo oracle, bit-equality
  * pinned (PqEncodeFormSpec).
  *
  * Bit-compatibility is the load-bearing property, and it has one
  * subtlety: the relational argmin orders by the DOUBLE-cast distance
  * (ties then break on the code), so two sub-centroids whose exact
  * decimal distances differ but collapse to the same double must tie
  * here as well. The eval therefore mirrors
  * [[graft.ops.KMeans.sqDistDecimal]] exactly — per-dimension term
  * rounded once into decimal scale 9 via the shortest-decimal
  * double→BigDecimal route Spark's Cast uses, exact decimal sum, ONE
  * double conversion at the end — and compares those doubles.
  *
  * CodegenFallback: the per-row work is a fixed S×k×(D/S) arithmetic
  * loop; falling back costs the enclosing projection its whole-stage
  * fusion but removes a corpus exchange, which dominates at any scale
  * (the MinhashSig family precedent, measured in TextHotBench).
  */
case class PqEncodeSig(child: Expression,
                       codebook: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
    extends UnaryExpression with CodegenFallback {
  require(codebook.nonEmpty && codebook.forall(_.nonEmpty),
    "codebook must have at least one subspace and one code")
  private val subspaces = codebook.length
  private val k = codebook(0).length
  private val sd = codebook(0)(0).length
  require(codebook.forall(s => s.length == k && s.forall(_.length == sd)),
    "codebook must be rectangular: same k and sub-dimension everywhere")
  // the codebook is held as nested IndexedSeq (Vector at the call
  // sites) so the case-class equals/hashCode are VALUE-based — with
  // raw arrays two semantically identical encode expressions never
  // compared equal, defeating canonicalization and common-subexpression
  // elimination; eval reads this flat array mirror (rebuilt per
  // executor after deserialization)
  @transient private lazy val cb: Array[Array[Double]] =
    codebook.map(_.flatten.toArray).toArray

  // Catalyst calls equals/hashCode repeatedly during analysis and
  // optimization (expression maps, semanticEquals, CSE); a naive
  // value hash would walk all S×k×(D/S) boxed doubles per call, so the
  // hash is computed once and equals checks it before the deep
  // codebook comparison (which then only runs on a true candidate
  // match or the vanishingly rare collision)
  @transient override lazy val hashCode: Int =
    scala.util.hashing.MurmurHash3.caseClassHash(this)
  override def equals(other: Any): Boolean = other match {
    case p: PqEncodeSig => (p eq this) ||
      (p.hashCode == hashCode && p.child == child && p.codebook == codebook)
    case _ => false
  }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode_sig"
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"$prettyName expects array<double>, got " +
            other.simpleString)
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData].toDoubleArray()
    if (arr.length != subspaces * sd)
      throw new IllegalArgumentException(
        s"$prettyName: vector has ${arr.length} dims, codebook expects " +
          s"${subspaces * sd}")
    val codes = new Array[Int](subspaces)
    var s = 0
    while (s < subspaces) {
      val base = s * sd
      var bestCode = 0
      var bestD = Double.PositiveInfinity
      val flat = cb(s)
      var c = 0
      while (c < k) {
        val cOff = c * sd
        var acc = java.math.BigDecimal.ZERO
        var i = 0
        while (i < sd) {
          val diff = arr(base + i) - flat(cOff + i)
          val term = diff * diff
          // the relational oracle's per-term cast to decimal(18,9)
          // OVERFLOWS (to null, which would then WIN its argmin via
          // NULLS FIRST) for terms >= 1e9 — outside the family's
          // declared distance domain. Unlimited BigDecimal here would
          // silently DIVERGE from that form instead of matching it, so
          // the domain is enforced loudly: scale embeddings (or pick
          // per-dimension spans) so |x - c| stays under ~31623.
          if (!(term < 1e9))
            throw new IllegalArgumentException(
              s"$prettyName: squared per-dimension distance $term " +
                "exceeds the decimal(18,9) domain (|diff| >= ~31623); " +
                "scale the embedding space")
          acc = acc.add(java.math.BigDecimal.valueOf(term)
            .setScale(9, java.math.RoundingMode.HALF_UP))
          i += 1
        }
        val d = acc.doubleValue() // the relational form compares DOUBLES
        if (d < bestD) { bestD = d; bestCode = c }
        c += 1
      }
      codes(s) = bestCode
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): PqEncodeSig =
    copy(child = c)
}
