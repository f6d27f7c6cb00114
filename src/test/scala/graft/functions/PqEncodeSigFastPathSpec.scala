package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Pq

/** The binary-prefilter fast path inside PqEncodeSig narrows WHICH
  * codes the exact decimal kernel must decide between; these cases
  * force the narrow band where the prefilter must NOT decide alone —
  * near-ties inside the error envelope, duplicate centroids, the
  * decimal(18,9) domain edge, and a wide subspace — and pin
  * bit-equality against the relational encode (broadcast join +
  * decimal argmin window), the family's in-repo oracle. */
class PqEncodeSigFastPathSpec extends SparkSpec {
  import spark.implicits._

  private def parity(cbRows: org.apache.spark.sql.DataFrame,
                     vecs: org.apache.spark.sql.DataFrame,
                     subspaces: Int, dim: Int): Unit = {
    val a = Pq.encode(vecs, "vec_id", "v", cbRows, subspaces, dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = Pq.encodeLocal(vecs, "vec_id", "v", cbRows, subspaces, dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b, s"fast path diverged from the relational form")
    assert(a.nonEmpty)
  }

  test("centroids spaced below the 9-dp resolution: every argmin is a " +
      "decimal near-tie the prefilter must hand to the exact kernel") {
    // entries 1e-10 apart collapse to the SAME rounded distance for
    // most vectors — the decimal tie order (smaller code) must win
    // even when the raw binary sums order strictly the other way
    val cbRows = (0 until 2).flatMap(s => (0 until 4).map(c =>
      (s, c, Seq(1.0 + c * 1e-10, 2.0 - c * 1e-10)))).toDF("sub", "code", "cv")
    val rnd = new scala.util.Random(11)
    val vecs = (0 until 40).map(i => (i.toLong,
      Seq.fill(4)(rnd.nextDouble() * 4 - 1))).toDF("vec_id", "v")
    parity(cbRows, vecs, subspaces = 2, dim = 4)
  }

  test("near-tie at the half-boundary of the 9th decimal") {
    // term values engineered within one decimal ulp of the x.5e-9
    // boundary: the shortest-decimal HALF_UP rounding decides, and the
    // two forms must agree code for code
    val cbRows = Seq(
      (0, 0, Seq(0.0)), (0, 1, Seq(1.0e-9)), (0, 2, Seq(5.0e-10)),
      (1, 0, Seq(0.0)), (1, 1, Seq(-1.0e-9)), (1, 2, Seq(2.5e-10))
    ).toDF("sub", "code", "cv")
    val vecs = Seq(
      (1L, Seq(5.0e-10, 5.0e-10)), (2L, Seq(2.5e-10, -2.5e-10)),
      (3L, Seq(7.5e-10, 1.25e-10)), (4L, Seq(0.0, 0.0)),
      (5L, Seq(1.0e-9, -1.0e-9))).toDF("vec_id", "v")
    parity(cbRows, vecs, subspaces = 2, dim = 2)
  }

  test("domain-edge magnitudes keep the envelope sound (a term near 1e9)") {
    // one |diff| just under ~31000 puts a term near the decimal(18,9)
    // ceiling where the binary error envelope is widest — the
    // prefilter's bound must still cover the exact value. The OTHER
    // dimension stays ~0 so the decimal SUM also respects the
    // relational form's decimal(18,9) range (sums are cast too).
    val cbRows = Seq(
      (0, 0, Seq(0.0, 0.0)), (0, 1, Seq(0.5, -0.5)),
      (1, 0, Seq(31000.0, 0.0)), (1, 1, Seq(30999.9999999, 1.0e-10))
    ).toDF("sub", "code", "cv")
    val vecs = Seq(
      (1L, Seq(31000.0, 0.0, 0.0, 0.0)),
      (2L, Seq(-0.25, 0.25, 30999.99999995, 5.0e-11)),
      (3L, Seq(15500.0, -15500.0, 15500.0, 0.0))).toDF("vec_id", "v")
    parity(cbRows, vecs, subspaces = 2, dim = 4)
  }

  test("wide subspace (sd = 10) rides the same decision procedure") {
    val rnd = new scala.util.Random(13)
    val cbRows = (0 until 2).flatMap(s => (0 until 3).map(c =>
      (s, c, Seq.fill(10)(rnd.nextDouble() * 10 - 5)))).toDF("sub", "code", "cv")
    val vecs = (0 until 25).map(i => (i.toLong,
      Seq.fill(20)(rnd.nextDouble() * 10 - 5))).toDF("vec_id", "v")
    parity(cbRows, vecs, subspaces = 2, dim = 20)
  }
}
