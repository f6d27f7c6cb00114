package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The equi-width histogram quantile sketch (Sketches.histCounts /
  * histQuantiles): hand-computed selection arithmetic, the one-bucket-
  * width error bound against the exact percentile, the union+re-sum
  * merge property, and edge-bucket clamping. */
class HistQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed: uniform singleton buckets interpolate exactly") {
    // values 0..9, lo=0 hi=10 m=10: every bucket holds one value.
    // q=0.5 -> rank 5 -> bucket 4 -> est = 4 + (5-4)/1 = 5.0
    val df = (0 until 10).map(_.toDouble).toDF("v")
    val counts = Sketches.histCounts(df, col("v"), 0.0, 10.0, 10)
    val est = Sketches.histQuantiles(counts, Seq(0.5, 1.0), 0.0, 10.0, 10)
      .orderBy("q").collect()
    assert(est(0).getDouble(1) == 5.0)
    assert(est(1).getDouble(1) == 10.0) // rank 10 -> bucket 9, frac 1
  }

  test("estimate is within one bucket width of the exact percentile") {
    val rnd = new scala.util.Random(20260814)
    val vs = List.fill(5000)(rnd.nextDouble() * 1000.0)
    val df = vs.toDF("v")
    val (lo, hi, m) = (0.0, 1000.0, 64)
    val width = (hi - lo) / m
    val counts = Sketches.histCounts(df, col("v"), lo, hi, m)
    val ests = Sketches.histQuantiles(counts, Seq(0.5, 0.9, 0.99), lo, hi, m)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val sorted = vs.sorted
    ests.foreach { case (q, est) =>
      val exact = sorted(math.ceil(q * vs.size).toInt - 1)
      assert(math.abs(est - exact) <= width,
        s"q=$q est=$est exact=$exact width=$width")
    }
  }

  test("two half-corpus sketches union+re-sum to the whole-corpus sketch") {
    val rnd = new scala.util.Random(7)
    val vs = List.fill(2000)(rnd.nextDouble() * 100.0)
    val (l, r) = vs.splitAt(900)
    val (lo, hi, m) = (0.0, 100.0, 32)
    def sketch(xs: List[Double]) =
      Sketches.histCounts(xs.toDF("v"), col("v"), lo, hi, m)
    val merged = sketch(l).union(sketch(r))
      .groupBy("bucket").agg(sum("cnt").as("cnt"))
    val whole = sketch(vs)
    val a = Sketches.histQuantiles(merged, Seq(0.5, 0.9), lo, hi, m)
      .orderBy("q").collect().toSeq
    val b = Sketches.histQuantiles(whole, Seq(0.5, 0.9), lo, hi, m)
      .orderBy("q").collect().toSeq
    assert(a == b)
  }

  test("out-of-range values clamp into the edge buckets") {
    val df = Seq(-50.0, -1.0, 5.0, 99.0, 150.0, 2000.0).toDF("v")
    val counts = Sketches.histCounts(df, col("v"), 0.0, 100.0, 10)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts(0) == 3L) // two below-range + 5.0
    assert(counts(9) == 3L) // 99.0 + two above-range
  }

  test("grouped sketch keeps groups independent") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 90.0), ("b", 80.0))
      .toDF("g", "v")
    val counts = Sketches.histCounts(df, col("v"), 0.0, 100.0, 10,
      groupCols = Seq(col("g")))
    val est = Sketches.histQuantiles(counts, Seq(1.0), 0.0, 100.0, 10,
        groupCols = Seq(col("g")))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(est("a") == 30.0 && est("b") == 100.0)
  }
}
