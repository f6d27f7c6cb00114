package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact interpolated percentile as a gather-and-sort Aggregator.
  *
  * Spark's builtin `percentile` aggregate maintains a value->count map
  * per group — measured ~26 s for one 8.3M-value frame group (the
  * classification global-threshold stage). Buffering the raw values and
  * running one primitive dual-pivot sort at finish is ~10x faster at
  * frame-group sizes and produces the SAME interpolated result (Spark /
  * numpy linear interpolation). Memory: one double per value per group,
  * spill-free — use only for groups known to fit a task (frames, rings);
  * the builtin remains the right choice for unbounded cardinality.
  */
object PercentileAgg {

  private class Agg(p: Double)
      extends Aggregator[java.lang.Double, Array[Double], Double] {
    def zero: Array[Double] = Array(0.0) // slot 0 = logical size

    // boxed input + null skip: the builtin `percentile` IGNORES nulls, and
    // a primitive-Double encoder would silently coerce them to 0.0 and
    // count them — a divergence waiting for the first nullable call site
    // (e.g. a left-join product)
    def reduce(buf: Array[Double], boxed: java.lang.Double): Array[Double] = {
      if (boxed == null) return buf
      val v = boxed.doubleValue()
      val n = buf(0).toInt
      val out = if (n + 1 >= buf.length) {
        val grown = new Array[Double](math.max(8, buf.length * 2))
        System.arraycopy(buf, 0, grown, 0, buf.length)
        grown
      } else buf
      out(n + 1) = v; out(0) = n + 1
      out
    }

    def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      val na = a(0).toInt; val nb = b(0).toInt
      val out = new Array[Double](na + nb + 1)
      out(0) = na + nb
      System.arraycopy(a, 1, out, 1, na)
      System.arraycopy(b, 1, out, 1 + na, nb)
      out
    }

    def finish(buf: Array[Double]): Double = {
      val n = buf(0).toInt
      if (n == 0) return Double.NaN
      java.util.Arrays.sort(buf, 1, n + 1)
      val pos = (n - 1) * p
      val lo = pos.toInt
      if (lo + 1 >= n) buf(n)
      else {
        // Spark's Percentile interpolation: symmetric convex combination
        // lower*(hi-pos) + higher*(pos-lo) — 1-ulp-identical to builtin
        val frac = pos - lo
        buf(lo + 1) * (1.0 - frac) + buf(lo + 2) * frac
      }
    }

    def bufferEncoder: Encoder[Array[Double]] = Encoders.kryo[Array[Double]]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: exact interpolated p-quantile of `value`. */
  def percentileExact(value: Column, p: Double): Column =
    udaf(new Agg(p)).apply(value)
}
