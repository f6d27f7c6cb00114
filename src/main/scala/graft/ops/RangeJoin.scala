package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed point-in-interval join. Spark plans a bare
  * `p.value BETWEEN i.lo AND i.hi` as BroadcastNestedLoopJoin (fine only
  * while one side broadcasts) or a cartesian product — the classic
  * large-×-large range-join trap. This is the standard bucketization:
  * pick a `bucketWidth`, explode each interval to the buckets it covers,
  * bucket each point, equi-join on the bucket (plus any exact keys), and
  * re-check the exact predicate. Cost: one hash shuffle of
  * |points| + Σ(interval span / width) rows — no row amplification
  * beyond the interval duplication factor, which the caller controls by
  * sizing `bucketWidth` near the typical interval length.
  *
  * Skew/pathology guard: an interval spanning more than
  * `maxBucketsPerInterval` buckets fails the job loudly (a single
  * [0, ∞)-ish interval would otherwise explode to millions of rows and
  * look like a hung shuffle); widen `bucketWidth` or split such
  * intervals upstream.
  *
  * Matching is INCLUSIVE on both ends (`lo <= p <= hi`), mirroring SQL
  * BETWEEN. Null points and null interval bounds match nothing (the
  * bucket arithmetic and the predicate are null-rejecting).
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double, keys: Seq[String] = Nil,
                      maxBucketsPerInterval: Int = 1024): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth $bucketWidth must be positive")
    require(!(points.columns ++ intervals.columns).contains("_rj_bucket"),
      "a side already carries the _rj_bucket helper column")
    val lob = floor(col(loCol) / bucketWidth).cast("long")
    val hib = floor(col(hiCol) / bucketWidth).cast("long")
    val iv = intervals
      // an INVERTED interval (lo > hi) matches nothing, like SQL
      // BETWEEN — and must be dropped BEFORE the sequence: a 2-arg
      // sequence(start, stop) defaults to step -1 when start > stop,
      // which would both bypass the span guard (negative span) and
      // still explode to span-many rows
      .where(col(loCol) <= col(hiCol))
      .withColumn("_rj_bucket", explode(sequence(lob,
        // fail loudly on a pathological span BEFORE the explode
        when(hib - lob < maxBucketsPerInterval, hib).otherwise(
          raise_error(concat(lit(s"interval spans more than " +
            s"$maxBucketsPerInterval buckets at width $bucketWidth: ["),
            col(loCol), lit(", "), col(hiCol), lit("]")))))))
    val pts = points.withColumn("_rj_bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    pts.join(iv, keys :+ "_rj_bucket")
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_rj_bucket")
  }

  /** Bucketed interval-OVERLAP join (both sides are intervals): match
    * where `lLo <= rHi && rLo <= lHi` (inclusive, touching endpoints
    * match — the SQL `a.lo <= b.hi AND b.lo <= a.hi` predicate that
    * Spark would otherwise plan as a nested-loop/cartesian). Both sides
    * explode to their covered buckets and equi-join on the bucket; a
    * pair sharing several buckets would duplicate, so the match is
    * emitted ONLY in the first shared bucket
    * (`bucket == max(floor(lLo/w), floor(rLo/w))`) — exactly-once
    * without any distinct pass. Same span guard and inverted-interval
    * rule as [[pointInInterval]], applied to BOTH sides; the caller's
    * column names must be disjoint across the sides (the join keeps
    * all four bound columns). Shuffle cost: one hash exchange of
    * Σ(span/width) rows per side. */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
                      right: DataFrame, rLo: String, rHi: String,
                      bucketWidth: Double, keys: Seq[String] = Nil,
                      maxBucketsPerInterval: Int = 1024): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth $bucketWidth must be positive")
    require(!(left.columns ++ right.columns).contains("_rj_bucket"),
      "a side already carries the _rj_bucket helper column")
    def spans(df: DataFrame, loCol: String, hiCol: String): DataFrame = {
      val lob = floor(col(loCol) / bucketWidth).cast("long")
      val hib = floor(col(hiCol) / bucketWidth).cast("long")
      df.where(col(loCol) <= col(hiCol))
        .withColumn("_rj_bucket", explode(sequence(lob,
          when(hib - lob < maxBucketsPerInterval, hib).otherwise(
            raise_error(concat(lit(s"interval spans more than " +
              s"$maxBucketsPerInterval buckets at width $bucketWidth: ["),
              col(loCol), lit(", "), col(hiCol), lit("]")))))))
    }
    spans(left, lLo, lHi).join(spans(right, rLo, rHi), keys :+ "_rj_bucket")
      .where(col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
        col("_rj_bucket") === greatest(
          floor(col(lLo) / bucketWidth), floor(col(rLo) / bucketWidth))
          .cast("long"))
      .drop("_rj_bucket")
  }
}
