package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The bucketed interval-overlap join: exactly-once emission for pairs
  * sharing several buckets, inclusive endpoint semantics, inverted-
  * interval and span-guard rules, and a random cross-check against the
  * naive cross-join predicate. */
class IntervalOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("random intervals: equals the naive cross-join overlap") {
    val rnd = new scala.util.Random(20260814)
    val l = (0 until 200).map { i =>
      val lo = rnd.nextDouble() * 100
      (i.toLong, lo, lo + rnd.nextDouble() * 12)
    }.toDF("l_id", "l_lo", "l_hi")
    val r = (0 until 150).map { i =>
      val lo = rnd.nextDouble() * 100
      (i.toLong, lo, lo + rnd.nextDouble() * 8)
    }.toDF("r_id", "r_lo", "r_hi")
    val got = RangeJoin.intervalOverlap(l, "l_lo", "l_hi", r, "r_lo", "r_hi",
        bucketWidth = 5.0)
      .select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val want = l.crossJoin(r)
      .where(col("l_lo") <= col("r_hi") && col("r_lo") <= col("l_hi"))
      .select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(got.length == got.toSet.size, "a pair emitted more than once")
    assert(got.toSet == want.toSet)
    assert(got.nonEmpty)
  }

  test("touching endpoints match; disjoint and inverted do not") {
    val l = Seq((1L, 0.0, 10.0), (2L, 20.0, 30.0), (3L, 50.0, 40.0))
      .toDF("l_id", "l_lo", "l_hi") // 3 is inverted -> matches nothing
    val r = Seq((1L, 10.0, 15.0), (2L, 31.0, 35.0), (3L, 40.0, 50.0))
      .toDF("r_id", "r_lo", "r_hi")
    val got = RangeJoin.intervalOverlap(l, "l_lo", "l_hi", r, "r_lo", "r_hi",
        bucketWidth = 7.0)
      .select("l_id", "r_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 1L))) // touching at 10.0 matches, inclusive
  }

  test("a pair spanning many shared buckets still emits once") {
    val l = Seq((1L, 0.0, 100.0)).toDF("l_id", "l_lo", "l_hi")
    val r = Seq((9L, 5.0, 95.0)).toDF("r_id", "r_lo", "r_hi")
    val got = RangeJoin.intervalOverlap(l, "l_lo", "l_hi", r, "r_lo", "r_hi",
      bucketWidth = 3.0).collect()
    assert(got.length == 1)
  }

  test("pathological span fails loudly on either side") {
    val l = Seq((1L, 0.0, 1e9)).toDF("l_id", "l_lo", "l_hi")
    val r = Seq((9L, 5.0, 6.0)).toDF("r_id", "r_lo", "r_hi")
    val e = intercept[Exception] {
      RangeJoin.intervalOverlap(l, "l_lo", "l_hi", r, "r_lo", "r_hi",
        bucketWidth = 1.0).collect()
    }
    assert(e.getMessage != null)
  }
}
