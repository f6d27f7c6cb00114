package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Pq

/** Bit-equality of the row-local PqEncodeSig expression against the
  * relational encode (broadcast join + decimal argmin window) — the
  * family pattern (MinhashSig, RepetitionSig): the expression is the
  * zero-shuffle production path, the relational form the pinned
  * in-repo oracle. Covers exact codebook ties (duplicate entries must
  * break to the smaller code in both forms) and a trained codebook
  * over random vectors. */
class PqEncodeFormSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val subspaces = 2

  test("expression == relational on a trained codebook, random vectors") {
    val rnd = new scala.util.Random(20260814)
    val vecs = (0 until 60).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 20 - 10)))
      .toDF("vec_id", "v")
    val (cb, _) = Pq.train(vecs, "vec_id", "v", subspaces, dim, 5, 2)
    val a = Pq.encode(vecs, "vec_id", "v", cb, subspaces, dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = Pq.encodeLocal(vecs, "vec_id", "v", cb, subspaces, dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b)
    assert(a.size == 60)
  }

  test("exact codebook ties break to the smaller code in both forms") {
    // codes 0 and 1 are IDENTICAL entries: every vector ties exactly,
    // and both forms must pick code 0; code 2 is far away
    val cbRows = Seq(
      (0, 0, Seq(1.0, 2.0, 3.0, 4.0)), (0, 1, Seq(1.0, 2.0, 3.0, 4.0)),
      (0, 2, Seq(99.0, 99.0, 99.0, 99.0)),
      (1, 0, Seq(5.0, 6.0, 7.0, 8.0)), (1, 1, Seq(5.0, 6.0, 7.0, 8.0)),
      (1, 2, Seq(-99.0, -99.0, -99.0, -99.0))
    ).toDF("sub", "code", "cv")
    val vecs = Seq((7L, Seq(1.1, 2.1, 2.9, 4.0, 5.0, 6.2, 6.9, 8.1)))
      .toDF("vec_id", "v")
    val a = Pq.encode(vecs, "vec_id", "v", cbRows, subspaces, dim)
      .collect()(0).getSeq[Int](1)
    val b = Pq.encodeLocal(vecs, "vec_id", "v", cbRows, subspaces, dim)
      .collect()(0).getSeq[Int](1)
    assert(a == Seq(0, 0) && b == Seq(0, 0))
  }

  test("out-of-domain distances fail loudly instead of diverging") {
    // |diff| >= ~31623 overflows the relational form's decimal(18,9)
    // term to null (which would WIN its argmin) — the expression must
    // reject, not silently differ from its pinned oracle
    val cbRows = Seq((0, 0, Seq(0.0, 0.0, 0.0, 0.0)),
      (1, 0, Seq(0.0, 0.0, 0.0, 0.0))).toDF("sub", "code", "cv")
    val far = Seq((1L, Seq(1e6, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "v")
    val e = intercept[Exception] {
      Pq.encodeLocal(far, "vec_id", "v", cbRows, subspaces, dim).collect()
    }
    assert(e.getMessage != null)
  }

  test("two identical encode expressions compare EQUAL (value-based " +
      "codebook) — the canonicalization contract") {
    // with the codebook held as raw arrays, equals was identity-based
    // and common-subexpression elimination could never fire on two
    // structurally identical encodes (r8 advisory)
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def cb() = Vector(
      Vector(Vector(1.0, 2.0), Vector(3.0, 4.0)),
      Vector(Vector(5.0, 6.0), Vector(7.0, 8.0)))
    val child = BoundReference(0, ArrayType(DoubleType), nullable = true)
    val e1 = PqEncodeSig(child, cb())
    val e2 = PqEncodeSig(child, cb())
    assert(e1 == e2 && e1.hashCode == e2.hashCode)
    assert(e1.canonicalized == e2.canonicalized)
    val different = PqEncodeSig(child,
      cb().updated(0, Vector(Vector(9.0, 9.0), Vector(3.0, 4.0))))
    assert(e1 != different)
  }

  test("dimension mismatch fails loudly") {
    val cbRows = Seq((0, 0, Seq(1.0, 2.0, 3.0, 4.0)),
      (1, 0, Seq(5.0, 6.0, 7.0, 8.0))).toDF("sub", "code", "cv")
    val bad = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "v")
    val e = intercept[Exception] {
      Pq.encodeLocal(bad, "vec_id", "v", cbRows, subspaces, dim).collect()
    }
    assert(e.getMessage != null)
  }
}
