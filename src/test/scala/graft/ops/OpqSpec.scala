package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The OPQ-lite Householder rotation must be a genuine isometry (else
  * the "recall measured against unchanged ground truth" claim is
  * false), must put the PCA direction on +e1, and must degenerate to
  * the identity when the direction is already aligned. */
class OpqSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260815)
  private val dim = 16

  private def fpDir(d: Array[Double]): Array[Long] = {
    // emulate Pca.fit's fixed-point form: 1e6 scale, max-|comp| = 1e6
    val m = d.map(math.abs).max
    d.map(x => math.round(x / m * 1e6))
  }

  test("householderU maps the direction onto +e1; aligned input is " +
      "identity") {
    val d = Array.fill(dim)(rnd.nextGaussian())
    val u = Opq.householderU(fpDir(d))
    assert(u.nonEmpty)
    val dd = fpDir(d).map(_.toDouble / 1e6)
    val rot = Seq(Tuple1(dd.toSeq)).toDF("v")
      .select(Opq.rotate(col("v"), u).as("r"))
      .collect()(0).getSeq[Double](0)
    val norm = math.sqrt(dd.map(x => x * x).sum)
    assert(math.abs(rot.head - norm) < 1e-9, s"head ${rot.head} vs $norm")
    rot.tail.foreach(x => assert(math.abs(x) < 1e-9, s"tail $x"))

    val aligned = Array.tabulate(dim)(i => if (i == 0) 1.0 else 0.0)
    assert(Opq.householderU(fpDir(aligned)).isEmpty)
    // empty u: rotation is the identity
    val id = Seq(Tuple1(dd.toSeq)).toDF("v")
      .select(Opq.rotate(col("v"), Array.emptyDoubleArray).as("r"))
      .collect()(0).getSeq[Double](0)
    assert(id == dd.toSeq)
  }

  test("rotation is an isometry: pairwise squared L2 distances are " +
      "preserved; H is an involution") {
    val d = Array.fill(dim)(rnd.nextGaussian())
    val u = Opq.householderU(fpDir(d))
    val vecs = (0 until 30).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextGaussian() * 5)))
    val df = vecs.toDF("id", "v")
      .withColumn("r", Opq.rotate(col("v"), u))
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getSeq[Double](1), r.getSeq[Double](2))).toSeq
    def sq(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for {
      (ia, va, ra) <- rows
      (ib, vb, rb) <- rows if ib > ia
    } {
      val dv = sq(va, vb); val dr = sq(ra, rb)
      assert(math.abs(dv - dr) <= 1e-9 * math.max(1.0, dv),
        s"distance $ia-$ib changed: $dv -> $dr")
    }
    // involution: H(H v) == v to round-off
    val twice = df.select(col("id"),
        Opq.rotate(col("r"), u).as("rr"), col("v"))
      .collect()
    twice.foreach { r =>
      val v = r.getSeq[Double](2); val rr = r.getSeq[Double](1)
      v.zip(rr).foreach { case (x, y) =>
        assert(math.abs(x - y) <= 1e-9, s"involution broke: $x vs $y") }
    }
  }

  test("codegen and interpreted evaluation agree bitwise") {
    val d = Array.fill(dim)(rnd.nextGaussian())
    val u = Opq.householderU(fpDir(d))
    val expr = graft.functions.VectorExpressions.HouseholderRotate(
      org.apache.spark.sql.graftshim.Internals.expression(col("v")), u)
    val vs = Seq.fill(20)(Seq.fill(dim)(rnd.nextGaussian() * 3))
    val viaDf = vs.map(Tuple1(_)).toDF("v")
      .select(Opq.rotate(col("v"), u).as("r"))
      .collect().map(_.getSeq[Double](0))
    // interpreted path: nullSafeEval on ArrayData
    val viaEval = vs.map { v =>
      expr.nullSafeEval(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          v.toArray))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray().toSeq
    }
    viaDf.zip(viaEval).foreach { case (a, b) =>
      a.zip(b).foreach { case (x, y) =>
        assert(java.lang.Double.compare(x, y) == 0, s"$x vs $y") }
    }
  }
}
