package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Skew-safe grouped top-k by score — the generic form of the two-phase
  * sampler's pattern ([[Sampling.smallestHashSampleTwoPhase]]): the
  * window form (`row_number() OVER (PARTITION BY g ORDER BY score DESC)`)
  * shuffles the FULL data on the group key and a hot group lands in one
  * task; here phase 1 is a bounded aggregator whose map-side partial
  * keeps at most k (score, id) pairs per group per task, so the exchange
  * moves ≤ tasks × groups × k 16-byte pairs whatever the data size, and
  * phase 2 joins the ≤ groups × k winners back for their payload. A
  * group's cost no longer depends on its row count beyond the scan —
  * the 100 TB "top documents per language by quality" shape.
  *
  * Ordering: score DESCENDING, ties on the id ASCENDING — identical to
  * the window form's `orderBy(score.desc, id)` (equivalence-spec-pinned).
  * `id` must be non-null, integral, and unique within its group (the
  * repo's key convention); scores must not be NaN (NaN has no place in
  * a ranking; the window form would sort it arbitrarily high).
  */
object TopK {

  /** One candidate: score and the (integral) id. */
  final case class ScoreId(s: Double, i: Long)

  /** Bounded top-k aggregator over (score, id) pairs, kept sorted by
    * (score desc, id asc) in a flat long array (score bits via
    * doubleToRawLongBits — the buffer crosses the exchange as a native
    * long-array memcpy, the MedianMadAgg/TopNAgg precedent). */
  private class TopKAgg(k: Int)
      extends Aggregator[ScoreId, Array[Long], Seq[ScoreId]] {
    private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 > s2 || (s1 == s2 && i1 < i2)
    private def sAt(buf: Array[Long], j: Int): Double =
      java.lang.Double.longBitsToDouble(buf(2 * j))
    private def iAt(buf: Array[Long], j: Int): Long = buf(2 * j + 1)

    def zero: Array[Long] = Array.emptyLongArray

    def reduce(buf: Array[Long], in: ScoreId): Array[Long] = {
      val m = buf.length / 2
      if (m == k && !better(in.s, in.i, sAt(buf, k - 1), iAt(buf, k - 1)))
        return buf
      var pos = m
      while (pos > 0 && better(in.s, in.i, sAt(buf, pos - 1), iAt(buf, pos - 1)))
        pos -= 1
      val keep = math.min(m + 1, k)
      val out = new Array[Long](keep * 2)
      System.arraycopy(buf, 0, out, 0, pos * 2)
      out(2 * pos) = java.lang.Double.doubleToRawLongBits(in.s)
      out(2 * pos + 1) = in.i
      val rest = keep - pos - 1
      if (rest > 0) System.arraycopy(buf, pos * 2, out, (pos + 1) * 2,
        rest * 2)
      out
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val ma = a.length / 2; val mb = b.length / 2
      val keep = math.min(ma + mb, k)
      val out = new Array[Long](keep * 2)
      var ia = 0; var ib = 0; var io = 0
      while (io < keep) {
        val takeA = ib >= mb || (ia < ma &&
          better(sAt(a, ia), iAt(a, ia), sAt(b, ib), iAt(b, ib)))
        if (takeA) { out(2 * io) = a(2 * ia); out(2 * io + 1) = a(2 * ia + 1)
          ia += 1 }
        else { out(2 * io) = b(2 * ib); out(2 * io + 1) = b(2 * ib + 1)
          ib += 1 }
        io += 1
      }
      out
    }

    def finish(buf: Array[Long]): Seq[ScoreId] =
      (0 until buf.length / 2).map(j => ScoreId(sAt(buf, j), iAt(buf, j)))

    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[ScoreId]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoreId]]()
  }

  /** Window-form reference (and the small-group fast path): full data
    * shuffles on the group key. Adds `topk_rank` (1..k). */
  def topKByScoreWindow(df: DataFrame, group: Column, id: Column,
                        score: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(group).orderBy(score.desc, id)
    df.withColumn("topk_rank", row_number().over(w))
      .where(col("topk_rank") <= k)
  }

  /** Two-phase grouped top-k — SAME rows as [[topKByScoreWindow]]
    * (equivalence-spec-pinned): bounded map-side top-k, then one
    * equi-join back onto the data for the payload. Adds `topk_rank`,
    * REPLACING any existing column of that name, exactly as the window
    * form's withColumn does. A NULL group is a group like any other
    * (null-safe join-back). */
  def topKByScore(df: DataFrame, group: Column, id: Column, score: Column,
                  k: Int): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val base = df.drop("topk_rank")
    val top = base.groupBy(group.as("__tk_g"))
      .agg(udaf(new TopKAgg(k), Encoders.product[ScoreId])
        .apply(score.cast("double"), id.cast("long")).as("__tk_top"))
      .select(col("__tk_g"),
        posexplode(col("__tk_top")).as(Seq("__tk_pos", "__tk_si")))
      .select(col("__tk_g"),
        (col("__tk_pos") + 1).cast("int").as("topk_rank"),
        col("__tk_si.i").as("__tk_i"))
    base.join(top, group <=> col("__tk_g") &&
        id.cast("long") === col("__tk_i"))
      .drop("__tk_g", "__tk_i")
  }
}
