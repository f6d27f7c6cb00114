package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.VectorOps

/** Bit-exact parity of the codegen'd vector expressions against the
  * interpreted higher-order-function forms they replaced (round-1
  * VectorOps/Dedup implementations, kept inline here as the oracle). */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private def vec(d: Int) = Seq.fill(d)(rnd.nextDouble() * 2 - 1)

  test("dot and cosine match the HOF fold bit-exactly") {
    val df = (1 to 50).map(_ => (vec(64), vec(64))).toDF("a", "b")
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val out = df.select(
      VectorOps.dot($"a", $"b").as("d"), hofDot($"a", $"b").as("d0"),
      VectorOps.cosine($"a", $"b").as("c"),
      (hofDot($"a", $"b") / (sqrt(hofDot($"a", $"a")) *
        sqrt(hofDot($"b", $"b")))).as("c0")).collect()
    out.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "dot mismatch")
      assert(r.getDouble(2) == r.getDouble(3), "cosine mismatch")
    }
  }

  test("lshBuckets matches the HOF plane-fold form exactly") {
    val dim = 16; val nPlanes = 10
    val df = (1 to 40).map(_ => Tuple1(vec(dim))).toDF("v")
    val hofBits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with($"v", sequence(lit(p * dim), lit(p * dim + dim - 1)),
          (x, i) => x * sin(i + lit(1.0))),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val out = df.select(VectorOps.lshBuckets($"v", dim, nPlanes).as("b"),
      hofBits.as("b0")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(out.map(_.getLong(0)).distinct.length > 1, "buckets degenerate")
  }

  test("eqCount matches zip_with/filter signature agreement") {
    val df = (1 to 30).map { _ =>
      val a = Seq.fill(32)(rnd.nextInt(4).toLong)
      val b = Seq.fill(32)(rnd.nextInt(4).toLong)
      (a, b)
    }.toDF("a", "b")
    val out = df.select(VectorOps.eqCount($"a", $"b").as("c"),
      size(filter(zip_with($"a", $"b", (x, y) => x === y), p => p)).as("c0"))
      .collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("expressions survive both codegen and interpreted paths") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val expect = 1.0 * 4 + 2 * 5 + 3 * 6
    // wholeStage on (default)
    assert(df.select(VectorOps.dot($"a", $"b")).head.getDouble(0) == expect)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(df.select(VectorOps.dot($"a", $"b")).head.getDouble(0) == expect)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("geometry contentKey: distinct calibrations get distinct keys") {
    import graft.core.Calibration
    val a = Calibration()
    val b = a.copy(distance = a.distance + 1e-9)
    assert(graft.geometry.Geometry.contentKey(a) !=
      graft.geometry.Geometry.contentKey(b))
    assert(graft.geometry.Geometry.contentKey(a) ==
      graft.geometry.Geometry.contentKey(Calibration()))
  }
}
