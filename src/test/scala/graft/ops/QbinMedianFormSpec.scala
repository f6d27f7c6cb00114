package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Bit-for-bit equality of the one-pass median/MAD Aggregator
  * ([[RobustStats.medianMadOnePass]], the form every pipeline and oracle
  * call site ships) against the pure-builtin two-stage baseline
  * ([[RobustStats.medianMad]]: builtin `median` + broadcast join-back) —
  * so the Aggregator's builtin-equivalence claim is CI-covered across the
  * edge cases, not just on the happy path OpsSpec samples.
  *
  * Covers: odd and even group sizes (interpolated median), heavy
  * duplicates, singleton groups, NaN-bearing groups (Arrays.sort places
  * NaN last, exactly like the Tungsten sort under the builtin), null
  * values (both SKIP them — the Aggregator's original primitive-Double
  * encoder silently coerced null to 0.0 and counted it; this spec is
  * what caught that), negative/zero/subnormal mixes, and multi-key
  * grouping.
  *
  * (Historical note: this spec was written to compare the Tungsten-sort
  * SortedMedianMad kernel against the Aggregator; QbinBench measured the
  * Aggregator faster in every interleaved pair at 4×2880² — geomean
  * 0.29–0.46× — so the sorted kernel was deleted, SCALE_r07.md.)
  */
class QbinMedianFormSpec extends SparkSpec {
  import spark.implicits._

  private def compare(rows: Seq[(Int, Int, java.lang.Double)]): Unit = {
    val df = rows.toDF("k1", "k2", "g")
    val a = RobustStats.medianMadOnePass(df, Seq("k1", "k2"), "g")
      .select("k1", "k2", "med", "n", "mad")
      .orderBy("k1", "k2").collect()
    val b = RobustStats.medianMad(df, Seq("k1", "k2"), "g")
      .select("k1", "k2", "med", "n", "mad")
      .orderBy("k1", "k2").collect()
    assert(a.length == b.length, s"group counts differ: $a vs $b")
    a.zip(b).foreach { case (ra, rb) =>
      assert(ra.getInt(0) == rb.getInt(0) && ra.getInt(1) == rb.getInt(1))
      assert(ra.getLong(3) == rb.getLong(3), s"n differs: $ra vs $rb")
      // bit-level compare: NaN == NaN, -0.0 != 0.0. The builtin median
      // returns null for an all-null group where the Aggregator returns
      // NaN — both read "no median"; normalize to NaN bits.
      def bits(r: org.apache.spark.sql.Row, i: Int) =
        java.lang.Double.doubleToLongBits(
          if (r.isNullAt(i)) Double.NaN else r.getDouble(i))
      assert(bits(ra, 2) == bits(rb, 2), s"med differs: $ra vs $rb")
      assert(bits(ra, 4) == bits(rb, 4), s"mad differs: $ra vs $rb")
    }
  }

  test("odd and even group sizes, duplicates, singletons") {
    compare(Seq(
      // odd size 5 with duplicates
      (1, 1, 3.0), (1, 1, 1.0), (1, 1, 3.0), (1, 1, 7.0), (1, 1, 2.0),
      // even size 4 -> interpolated median and MAD
      (1, 2, 10.0), (1, 2, 20.0), (1, 2, 30.0), (1, 2, 41.0),
      // all-equal group (MAD = 0)
      (2, 1, 5.5), (2, 1, 5.5), (2, 1, 5.5),
      // singleton
      (2, 2, -4.25)
    ).map { case (a, b, v) => (a, b, java.lang.Double.valueOf(v)) })
  }

  test("negative, zero and subnormal mixes") {
    compare(Seq(
      (1, 1, -3.0), (1, 1, -1.0), (1, 1, 0.0), (1, 1, 2.0),
      (1, 2, java.lang.Double.MIN_VALUE), (1, 2, 0.0),
      (1, 2, -java.lang.Double.MIN_VALUE),
      (2, 1, 1e300), (2, 1, -1e300), (2, 1, 0.5), (2, 1, 0.25)
    ).map { case (a, b, v) => (a, b, java.lang.Double.valueOf(v)) })
  }

  test("NaN-bearing groups sort NaN last in both forms") {
    compare(Seq(
      (1, 1, Double.NaN), (1, 1, 1.0), (1, 1, 2.0),
      (1, 2, Double.NaN), (1, 2, Double.NaN),
      (2, 1, 4.0), (2, 1, Double.NaN), (2, 1, 8.0), (2, 1, 6.0)
    ).map { case (a, b, v) => (a, b, java.lang.Double.valueOf(v)) })
  }

  test("null values are skipped by both forms, n counts non-nulls") {
    compare(Seq[(Int, Int, java.lang.Double)](
      (1, 1, 1.0), (1, 1, null), (1, 1, 3.0),
      (1, 2, null), (1, 2, 7.0)))
  }

  test("larger randomized groups (seeded)") {
    val rnd = new scala.util.Random(42)
    val rows = for {
      k <- 0 until 20
      _ <- 0 until (50 + k) // mixes odd and even sizes
    } yield (k % 4, k / 4,
      java.lang.Double.valueOf(math.rint(rnd.nextGaussian() * 50) / 8))
    compare(rows)
  }
}
