package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling for corpus curation. `rand()`-based sampling
  * is useless for a reproducible training-data pipeline (re-runs and
  * retries see different rows, and the sample can't be re-derived for
  * audit); everything here keys off a hash of a stable row id, so the
  * same row is in or out of the sample on every run, every partitioning,
  * every cluster size.
  *
  * Scale notes: [[stratifiedSample]] is a pure filter — no shuffle at
  * all, fully pushdown-friendly, the form to use at 100 TB.
  * [[smallestHashSample]] (exact-N per stratum) needs a per-stratum
  * order, i.e. one shuffle on the stratum key; with few large strata the
  * window partitions are skewed, so for huge data prefer a two-phase
  * variant (per-partition top-N, then merge) — at the sizes where an
  * exact count matters (eval splits, capped per-language quotas) N is
  * small and the grouped top-N below is the standard shape.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from a row-id column. */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(xxhash64(id), lit(buckets.toLong))

  /** Rate-based stratified sample: keep a row of stratum s iff
    * `hash(id) mod buckets < round(rates(s) * buckets)`. Unknown strata
    * get `defaultRate`. Deterministic, no shuffle, composable with any
    * downstream plan. The cutoff is computed as an INTEGER on the
    * driver — comparing against the raw double product would admit one
    * extra bucket whenever `rate * buckets` rounds a hair above the
    * intended integer (0.07 * 100 == 7.000000000000001).
    */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column,
                       rates: Map[String, Double], defaultRate: Double,
                       buckets: Int = 1000): DataFrame = {
    def cutoff(r: Double): Long = {
      require(r >= 0.0 && r <= 1.0, s"rate $r outside [0, 1]")
      math.round(r * buckets)
    }
    val threshold = rates.foldLeft(lit(cutoff(defaultRate))) {
      case (acc, (s, r)) => when(stratum === s, lit(cutoff(r))).otherwise(acc)
    }
    df.where(hashBucket(id, buckets) < threshold)
  }

  /** Exact-N-per-stratum sample: the N rows with the smallest id-hash in
    * each stratum — a uniform without-replacement draw that is stable
    * under reruns AND under data growth (a row only leaves the sample
    * when a smaller-hash row arrives). Adds `sample_rank` (1..N).
    * Hash ties (astronomically unlikely with xxhash64, but determinism
    * must not rest on luck) break on the id itself.
    */
  def smallestHashSample(df: DataFrame, stratum: Column, id: Column,
                         n: Int): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(xxhash64(id), id)
    df.withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= n)
  }

  /** Weighted Bernoulli sample: keep each row independently with
    * probability `prob` (a column in [0,1]; values outside are clamped,
    * and a NULL prob reads as 0 — the row is explicitly excluded rather
    * than silently dropped by a three-valued-logic filter),
    * deterministically — the "coin flip" is the id-hash folded to a
    * 32-bit uniform, compared against floor(prob * 2^32). Like
    * [[stratifiedSample]] this is a PURE FILTER (no shuffle, rerun- and
    * partitioning-stable, rides the scan at 100 TB), but the keep
    * probability can vary continuously per row — the quality-weighted
    * downsampling a curation pass wants. The float product takes exactly
    * one rounding before the integer floor, so the kept set reproduces
    * in any engine that computes `prob` with the same arithmetic. */
  def weightedSample(df: DataFrame, id: Column, prob: Column): DataFrame = {
    val unit = pmod(xxhash64(id), lit(1L << 32))
    val cutoff = floor(
      least(greatest(coalesce(prob, lit(0.0)), lit(0.0)), lit(1.0)) *
        lit(4294967296.0))
    df.where(unit < cutoff)
  }
}
