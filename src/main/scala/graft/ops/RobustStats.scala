package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grouped robust statistics: exact per-group median, MAD (median absolute
  * deviation), and the derived robust outlier mask.
  *
  * This is the engine's core operator, modelled on the reference's per-ring
  * outlier kernel (reference: sources/fmask.c:79-293 — counting-sort pixels
  * into 2-theta rings, per-ring median/MAD via quickselect, mask pixels
  * outside median +/- esdMul * 1.4826 * MAD, skip rings with < 10 px).
  *
  * Spark-first design: two grouped aggregations (median, then median of
  * absolute deviations) joined back to the fact table. The per-group
  * aggregate outputs are tiny relative to the fact table (rings << pixels),
  * so the join back is a broadcast hash join — the big side never shuffles.
  * At 100 TB this means each frame's pixel partition streams through two
  * codegen'd stages with only the small aggregates moving over the network.
  */
object RobustStats {

  /** 1.4826 = 1/Phi^-1(0.75): scales MAD to estimate a Gaussian sigma
    * (reference: sources/fmask.c:242-249). */
  val MadToSigma = 1.4826

  /** Per-group (median, count). One shuffle on `keys`. `n` counts the
    * NON-NULL values the median was computed over (nulls are skipped by
    * the builtin `median`), matching [[MedianMadAgg]] — on the
    * pipeline's never-null intensity columns the two readings are
    * identical. */
  def groupMedian(df: DataFrame, keys: Seq[String], value: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(median(col(value)).as("med"), count(col(value)).as("n"))

  /** Per-group (median, MAD, count). Two grouped stages, with the small
    * stage-1 aggregate broadcast back onto the fact table (reference
    * semantics: sources/fmask.c:234-289). */
  def medianMad(df: DataFrame, keys: Seq[String], value: String): DataFrame = {
    val med = groupMedian(df, keys, value)
    df.join(broadcast(med), keys)
      .groupBy(keys.map(col): _*)
      .agg(
        first(col("med")).as("med"),
        first(col("n")).as("n"),
        median(abs(col(value) - col("med"))).as("mad"))
  }

  /** Single-pass variant of [[medianMad]] using the custom
    * [[MedianMadAgg]] Aggregator — one shuffle, no join-backs. Preferred
    * when group populations are bounded (detector rings); the two-stage
    * form remains the oracle-exact baseline. */
  def medianMadOnePass(df: DataFrame, keys: Seq[String],
                       value: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(MedianMadAgg.medMad(col(value)).as("mm"))
      .select(keys.map(col) ++ Seq(col("mm.med").as("med"),
        col("mm.n").as("n"), col("mm.mad").as("mad")): _*)

  /** Flag rows whose value is further than `esdMul * MadToSigma * MAD` from
    * the group median; groups with fewer than `minCount` rows are never
    * flagged (reference: sources/fmask.c:237 skips rings with < 10 px,
    * esdMul from Masks.SpotMask.esdMul — GSASII_imports.py:739-852).
    *
    * Returns the input rows plus columns `med`, `mad`, `n`, `is_outlier`.
    */
  def outlierFlag(df: DataFrame, keys: Seq[String], value: String,
                  esdMul: Double = 3.0, minCount: Long = 10): DataFrame = {
    val stats = medianMad(df, keys, value)
    df.join(broadcast(stats), keys)
      .withColumn("is_outlier",
        col("n") >= minCount &&
        abs(col(value) - col("med")) > lit(esdMul * MadToSigma) * col("mad"))
  }

  /** Deterministic (cross-engine reproducible) sample standard deviation:
    * computed from exact decimal sums of x and x^2 so the result does not
    * depend on accumulation order. Use where an external oracle must
    * hash-match; `stddev_samp` is preferred when tolerance compares suffice.
    */
  def stddevDet(x: Column, n: Column): Column = {
    val sx  = sum(x.cast("decimal(18,6)")).cast("double")
    val sx2 = sum((x * x).cast("decimal(28,6)")).cast("double")
    sqrt((sx2 - sx * sx / n) / (n - lit(1)))
  }
}
