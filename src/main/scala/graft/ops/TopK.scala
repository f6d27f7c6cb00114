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
  * repo's key convention). A NULL or NaN score FAILS LOUDLY, naming the
  * id: neither has a defensible rank (the window form would happily
  * sort them somewhere, but "somewhere" is exactly the silent-garbage
  * outcome a curation pipeline must not ship), and NaN additionally has
  * no strict total order, which would corrupt the sorted bounded
  * buffer. Guarding at the column level keeps the aggregator's
  * invariants unconditional.
  */
object TopK {

  /** Bounded top-k over (score, id): the shared [[BoundedTopAgg]] with
    * scores carried as raw IEEE bits in the pair's first slot and the
    * (desc score, asc id) order decoded in the comparator. Inputs are
    * (Double, Long); NaN is excluded upstream by [[topKByScore]]'s
    * loud guard. */
  private class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), Array[Long], Seq[(Long, Long)]] {
    private val inner = new BoundedTopAgg(k,
      (s1b: Long, i1: Long, s2b: Long, i2: Long) => {
        val s1 = java.lang.Double.longBitsToDouble(s1b)
        val s2 = java.lang.Double.longBitsToDouble(s2b)
        s1 > s2 || (s1 == s2 && i1 < i2)
      })
    def zero: Array[Long] = inner.zero
    def reduce(buf: Array[Long], in: (Double, Long)): Array[Long] =
      inner.reduce(buf,
        (java.lang.Double.doubleToRawLongBits(in._1), in._2))
    def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      inner.merge(a, b)
    def finish(buf: Array[Long]): Seq[(Long, Long)] = inner.finish(buf)
    def bufferEncoder: Encoder[Array[Long]] = inner.bufferEncoder
    def outputEncoder: Encoder[Seq[(Long, Long)]] = inner.outputEncoder
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
    * (equivalence-spec-pinned) for non-null, non-NaN scores and
    * NON-NULL ids: bounded map-side top-k, then one equi-join back onto
    * the data for the payload. Adds `topk_rank`, REPLACING any existing
    * column of that name, exactly as the window form's withColumn does.
    * A NULL group is a group like any other (null-safe join-back); a
    * NULL id FAILS LOUDLY — the window form would rank it, but the
    * join-back here could never match it (null.cast(long) === __tk_i is
    * three-valued-false), so without the guard the row would vanish
    * SILENTLY, breaking the window-equivalence contract in exactly the
    * way the score guard exists to prevent. */
  def topKByScore(df: DataFrame, group: Column, id: Column, score: Column,
                  k: Int): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    val base = df.drop("topk_rank")
    val s = score.cast("double")
    val idGuarded = when(id.isNull,
      raise_error(lit("topKByScore: NULL id — the id column is the " +
        "join-back key and must be non-null"))).otherwise(id.cast("long"))
    val guarded = when(s.isNull || isnan(s),
      raise_error(concat(lit("topKByScore: NULL or NaN score for id "),
        id.cast("string")))).otherwise(s)
    val top = base.groupBy(group.as("__tk_g"))
      .agg(udaf(new TopKAgg(k), Encoders.product[(Double, Long)])
        .apply(guarded, idGuarded).as("__tk_top"))
      .select(col("__tk_g"),
        posexplode(col("__tk_top")).as(Seq("__tk_pos", "__tk_si")))
      .select(col("__tk_g"),
        (col("__tk_pos") + 1).cast("int").as("topk_rank"),
        col("__tk_si._2").as("__tk_i"))
    base.join(top, group <=> col("__tk_g") &&
        id.cast("long") === col("__tk_i"))
      .drop("__tk_g", "__tk_i")
  }
}
