package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned aggregation ("azimuthal integration" in the reference): map each
  * row to a bin index with closed-form arithmetic, then one hash aggregation.
  *
  * Reference semantics: pipeline.py:55-75 (`pytorch_integrate`) computes a
  * per-2theta-channel mean of corrected intensity, once per mask variant
  * (four bincount passes, pipeline.py:377-414). Here all variants are
  * computed as conditional aggregates in a SINGLE shuffle — the multi-variant
  * trick called out in SURVEY.md §2.4. The reference's own "v2" outlier
  * kernel (fmask.c:79-87) replaces a per-ring range scan with exactly this
  * computed-bin hash aggregation, which is what HashAggregateExec does.
  */
object Histogram {

  /** Closed-form bin index: floor((x - lo) / width), clamped to [0, nBins).
    * Out-of-range rows get bin -1 (reference discards them via bin 0 +
    * drop: pipeline.py:69-72, cache_creation.py:40-42). */
  def binIndex(x: Column, lo: Double, width: Double, nBins: Int): Column = {
    val raw = floor((x - lit(lo)) / lit(width)).cast("int")
    when(raw >= 0 && raw < nBins, raw).otherwise(lit(-1))
  }

  /** Mean of `value` per bin for each named variant predicate, one shuffle.
    * A variant's rows are those where its predicate holds. Deterministic
    * across engines: sums go through decimal, mean = decimalSum / count.
    * Extra `keys` (e.g. frame_no) group alongside the bin so many frames
    * integrate in the same single shuffle. */
  def integrate(df: DataFrame, bin: Column, value: Column,
                variants: Seq[(String, Column)],
                keys: Seq[Column] = Nil): DataFrame = {
    val aggs = variants.flatMap { case (name, pred) =>
      val v = when(pred, value)
      Seq(
        (sum(v.cast("decimal(18,4)")).cast("double") / count(v)).as(s"i_$name"),
        count(v).as(s"n_$name"))
    }
    df.groupBy(keys :+ bin.as("bin"): _*).agg(aggs.head, aggs.tail: _*)
  }
}
