package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketed range join: brute-force equivalence on overlapping
  * intervals, inclusive bounds, bucket-boundary points, multi-bucket
  * spans, null rejection, and the pathological-span guard. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matches the brute-force range join on overlapping intervals, " +
      "independent of bucket width") {
    val pts = (0 until 400).map(i => (i.toLong, i * 0.37)).toDF("pid", "v")
    val ivs = Seq(
      (1L, 0.0, 10.0), (2L, 5.0, 25.0), (3L, 24.99, 25.0),
      (4L, 30.0, 30.0),     // degenerate single point
      (5L, 90.0, 147.9))    // many buckets
      .toDF("iid", "lo", "hi")
    val brute = pts.crossJoin(ivs)
      .where($"v" >= $"lo" && $"v" <= $"hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(0.5, 3.0, 10.0, 1000.0)) {
      val got = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == brute, s"width $w diverges from brute force")
    }
  }

  test("inclusive bounds: a point exactly on lo or hi matches") {
    val pts = Seq((1L, 10.0), (2L, 20.0), (3L, 20.000001)).toDF("pid", "v")
    val ivs = Seq((7L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi", 4.0)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("null points and null bounds match nothing") {
    val pts = Seq((1L, Some(5.0)), (2L, Option.empty[Double]))
      .toDF("pid", "v")
    val ivs = Seq((7L, Some(0.0), Some(10.0)),
        (8L, Option.empty[Double], Some(10.0)))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi", 2.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 7L)))
  }

  test("exact keys scope the join per group") {
    val pts = Seq(("a", 5.0), ("b", 5.0)).toDF("g", "v")
    val ivs = Seq(("a", 0.0, 10.0)).toDF("g", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi", 2.0,
        keys = Seq("g"))
      .select("g").as[String].collect().toSeq
    assert(got == Seq("a"))
  }

  test("an inverted interval (lo > hi) matches nothing and does not " +
      "bypass the span guard via sequence's descending default step") {
    val pts = Seq((1L, 5.0)).toDF("pid", "v")
    val ivs = Seq((7L, 1e6, 0.0), (8L, 4.0, 6.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi", 1.0,
        maxBucketsPerInterval = 100)
      .select("iid").as[Long].collect().toSeq
    assert(got == Seq(8L)) // the million-bucket inversion yields nothing
  }

  test("an interval spanning more than maxBucketsPerInterval fails " +
      "loudly instead of exploding") {
    val pts = Seq((1L, 5.0)).toDF("pid", "v")
    val ivs = Seq((7L, 0.0, 1e9)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi", 1.0,
        maxBucketsPerInterval = 100).collect()
    }
    assert(ex.getMessage.contains("spans more than") ||
      Option(ex.getCause).exists(_.getMessage.contains("spans more than")))
  }
}
