package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

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

  /** Distributed exact interpolated p-quantile — the PARALLEL form of
    * [[percentileExact]] for groups the size of a whole frame.
    *
    * The gather-and-sort aggregator runs its final sort in ONE task per
    * group, so a 2-frame batch leaves 30 of 32 cores idle for the length
    * of an 8.3 M-value sort — measured as the hot critical-path stage of
    * the classify chain at production frame size (SCALE_r06.md). This
    * form never gathers a group: it finds the two order statistics the
    * interpolation needs by bucket-histogram rank selection —
    *
    *   1. per-group min/max/count (codegen HashAggregate);
    *   2. a 65536-bucket histogram of the value range (codegen);
    *   3. cumulative counts over the per-group histogram rows (a window
    *      over group x occupied-bucket rows — thousands per group, not
    *      millions) locate the bucket holding ranks ⌊pos⌋+1 and ⌊pos⌋+2;
    *   4. one filtered pass over just the target bucket(s), counted per
    *      DISTINCT value so heavy ties (the zero spike of a gradient
    *      field) cost one row, ranked by the same cumulative trick.
    *
    * Every stage is a codegen aggregate or a tiny window; parallelism is
    * data-partitions, independent of group count. Interpolation applies
    * the aggregator's exact formula — `vlo*(1-frac) + vhi*frac` with
    * `frac = pos - ⌊pos⌋`, `pos = (n-1)*p` — so results are bit-identical
    * to [[percentileExact]] on NaN-free input (asserted across ties,
    * all-equal and 1/2-element groups in PercentileSelectSpec; NaN-free
    * is the pipeline's regime — the aggregator remains the choice for
    * NaN-bearing or many-small-group data).
    *
    * Returns one row per group: (keys..., `outCol`). Groups whose values
    * are all null produce NO row (the aggregator yields NaN instead);
    * every caller joins the result back on the keys, where a NaN
    * threshold and an absent one behave alike.
    */
  def percentileSelect(df: DataFrame, keys: Seq[String], valueCol: String,
                       p: Double, outCol: String = "pct",
                       buckets: Int = 65536): DataFrame = {
    require(p >= 0.0 && p <= 1.0, s"percentile p out of [0,1]: $p")
    // global (no keys): run under a constant key so every internal join
    // is a broadcast HASH join — a crossJoin would plan a nested-loop,
    // which the plan invariants (rightly) forbid in query paths
    if (keys.isEmpty)
      return percentileSelect(df.withColumn("_pk", lit(1)), Seq("_pk"),
        valueCol, p, outCol, buckets).drop("_pk")
    val kcols = keys.map(col)
    val v = col(valueCol)
    def joinK(a: DataFrame, b: DataFrame): DataFrame = a.join(b, keys)

    val mm = df.groupBy(kcols: _*)
      .agg(min(v).as("_mn"), max(v).as("_mx"), count(v).as("_n"))
      .where(col("_n") > 0)
      .withColumn("_pos", (col("_n") - 1).cast("double") * lit(p))
      .withColumn("_frac", col("_pos") - floor(col("_pos")))
      .withColumn("_klo", floor(col("_pos")).cast("long") + 1)
      .withColumn("_khi", least(col("_klo") + 1, col("_n")))

    // monotone bucketing: v <= mx ⇒ (v-mn) <= (mx-mn) in FP, so the
    // ratio never exceeds 1 and the clamp only catches v == mx
    val bucketOf = when(col("_mx") <= col("_mn"), lit(0L)).otherwise(
      least(floor((v - col("_mn")) / (col("_mx") - col("_mn")) * buckets)
        .cast("long"), lit((buckets - 1).toLong)))
    val bucketed = joinK(df.where(v.isNotNull), broadcast(mm))
      .withColumn("_b", bucketOf)

    val hist = bucketed.groupBy(kcols :+ col("_b"): _*)
      .agg(count(lit(1)).as("_c"))
    val wb = Window.partitionBy(kcols: _*).orderBy(col("_b"))
    val targets = joinK(
        hist.withColumn("_cumEnd", sum(col("_c")).over(wb))
          .withColumn("_cumStart", col("_cumEnd") - col("_c")),
        broadcast(mm.select(kcols :+ col("_klo") :+ col("_khi"): _*)))
      .where((col("_klo") > col("_cumStart") &&
              col("_klo") <= col("_cumEnd")) ||
             (col("_khi") > col("_cumStart") &&
              col("_khi") <= col("_cumEnd")))
      .select(kcols :+ col("_b") :+ col("_cumStart"): _*)

    val perValue = bucketed
      .select(kcols :+ col("_b") :+ v.as("_v"): _*)
      .join(broadcast(targets), keys :+ "_b")
      .groupBy(kcols :+ col("_b") :+ col("_cumStart") :+ col("_v"): _*)
      .agg(count(lit(1)).as("_vc"))
    val wv = Window.partitionBy(kcols :+ col("_b"): _*).orderBy(col("_v"))
    val ranked = joinK(
      perValue.withColumn("_vEnd", col("_cumStart") + sum(col("_vc")).over(wv)),
      broadcast(mm.select(kcols :+ col("_klo") :+ col("_khi") :+
        col("_frac"): _*)))
    val vlo = ranked.where(col("_klo") > col("_vEnd") - col("_vc") &&
        col("_klo") <= col("_vEnd"))
      .select(kcols :+ col("_v").as("_vlo"): _*)
    val vhi = ranked.where(col("_khi") > col("_vEnd") - col("_vc") &&
        col("_khi") <= col("_vEnd"))
      .select(kcols :+ col("_v").as("_vhi") :+ col("_frac"): _*)
    // one row per group on both sides; the broadcast hint also keeps the
    // constant-key global path on a (1-row) broadcast nested loop instead
    // of a cartesian product after constant folding erases the condition
    joinK(vlo, broadcast(vhi)).select(kcols :+
      (col("_vlo") * (lit(1.0) - col("_frac")) +
        col("_vhi") * col("_frac")).as(outCol): _*)
  }
}
