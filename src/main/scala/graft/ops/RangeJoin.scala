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
}
