package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** The shared bounded top-n machinery behind
  * [[Sampling.smallestHashSampleTwoPhase]] and [[TopK.topKByScore]]:
  * a buffer of AT MOST n (a, b) long pairs kept sorted by the supplied
  * strict ordering, so the map-side partial aggregation already reduces
  * each task's contribution to n pairs per group, and the merge is a
  * truncated sorted-array merge. The common non-qualifying input (worse
  * than the current n-th) costs O(1). The buffer crosses the
  * partial→final exchange as a native long-array memcpy (the
  * MedianMadAgg encoder precedent).
  *
  * `precedes` must be a STRICT TOTAL order on the pairs the caller
  * feeds (the samplers use signed (hash, id); TopK decodes a double
  * from the first slot) — a pair incomparable with itself or ordered
  * inconsistently (NaN-style) would corrupt the sorted-buffer
  * invariants, which is why TopK rejects NaN scores loudly before the
  * aggregator ever sees them. */
private[ops] class BoundedTopAgg(
    n: Int, precedes: (Long, Long, Long, Long) => Boolean)
    extends Aggregator[(Long, Long), Array[Long], Seq[(Long, Long)]]
    with Serializable {

  def zero: Array[Long] = Array.emptyLongArray

  def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val m = buf.length / 2
    if (m == n && !precedes(in._1, in._2, buf(2 * n - 2), buf(2 * n - 1)))
      return buf
    var pos = m
    while (pos > 0 && precedes(in._1, in._2, buf(2 * pos - 2), buf(2 * pos - 1)))
      pos -= 1
    val keep = math.min(m + 1, n)
    val out = new Array[Long](keep * 2)
    System.arraycopy(buf, 0, out, 0, pos * 2)
    out(2 * pos) = in._1; out(2 * pos + 1) = in._2
    val rest = keep - pos - 1
    if (rest > 0) System.arraycopy(buf, pos * 2, out, (pos + 1) * 2,
      rest * 2)
    out
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val ma = a.length / 2; val mb = b.length / 2
    val keep = math.min(ma + mb, n)
    val out = new Array[Long](keep * 2)
    var ia = 0; var ib = 0; var io = 0
    while (io < keep) {
      val takeA = ib >= mb || (ia < ma &&
        precedes(a(2 * ia), a(2 * ia + 1), b(2 * ib), b(2 * ib + 1)))
      if (takeA) { out(2 * io) = a(2 * ia); out(2 * io + 1) = a(2 * ia + 1)
        ia += 1 }
      else { out(2 * io) = b(2 * ib); out(2 * io + 1) = b(2 * ib + 1)
        ib += 1 }
      io += 1
    }
    out
  }

  def finish(buf: Array[Long]): Seq[(Long, Long)] =
    (0 until buf.length / 2).map(j => (buf(2 * j), buf(2 * j + 1)))

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
