package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the attribution shape
  * (impression ⋈ click within a horizon) and the last Structured
  * Streaming primitive family in the engine (stateful map/flatMap,
  * windowed aggs, dedup, sessions, distinct, top-k are elsewhere).
  *
  * State boundedness is the whole design: both sides carry watermarks
  * and the join condition carries a TIME BOUND
  * (`rightTs BETWEEN leftTs AND leftTs + horizon`), which is exactly
  * what lets Spark evict: a left row older than
  * max-event-time − (watermark + horizon) can never match a future
  * right row and is dropped from the state store, so state is bounded
  * by arrival rate × (watermark + horizon), not by history. Without
  * the time bound the same join would accumulate both streams forever
  * — the trap this helper exists to make unmakeable.
  */
object StreamingJoin {

  /** Inner-join `left` rows to the `right` rows that share `key` and
    * fall inside `[leftTs, leftTs + horizonSec]`, with both sides
    * late-bounded by `watermarkSec`. Column names must be disjoint
    * apart from the key. Append-mode output: a pair emits once both
    * watermarks pass it. */
  def withinHorizon(left: DataFrame, leftTs: String,
                    right: DataFrame, rightTs: String,
                    key: String, horizonSec: Int,
                    watermarkSec: Int): DataFrame =
    joined(left, leftTs, right, rightTs, key, horizonSec, watermarkSec,
      "inner")

  /** The one watermark + time-bound + join assembly BOTH variants
    * delegate to — a condition or guard fix cannot diverge between the
    * inner and left-outer forms. */
  private def joined(left: DataFrame, leftTs: String,
                     right: DataFrame, rightTs: String,
                     key: String, horizonSec: Int, watermarkSec: Int,
                     joinType: String): DataFrame = {
    require(horizonSec > 0 && watermarkSec >= 0,
      s"need horizon > 0 and watermark >= 0, got $horizonSec/$watermarkSec")
    val l = left.withWatermark(leftTs, s"$watermarkSec seconds")
    val r = right.withWatermark(rightTs, s"$watermarkSec seconds")
    l.join(r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $horizonSec SECONDS"),
      joinType)
      .drop(r(key))
  }

  /** LEFT-OUTER [[withinHorizon]]: every left row eventually emits —
    * joined while matches arrive, or once, with null right columns,
    * after the watermark proves no in-horizon match can still come.
    * This is the attribution completeness case ("impression with NO
    * click"), and it only works BECAUSE of the time bound: Spark emits
    * the null row when the left row's state expires, so an unbounded
    * join condition would mean the null rows never surface (and state
    * never drains). Expect the null-extended rows to arrive a
    * watermark-delay later than the matches — they are declarations
    * that the horizon closed, not observations. */
  def withinHorizonLeftOuter(left: DataFrame, leftTs: String,
                             right: DataFrame, rightTs: String,
                             key: String, horizonSec: Int,
                             watermarkSec: Int): DataFrame =
    joined(left, leftTs, right, rightTs, key, horizonSec, watermarkSec,
      "left_outer")
}
