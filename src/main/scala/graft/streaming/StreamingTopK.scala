package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming heavy hitters per key — a Space-Saving summary in
  * `GroupState`: at most `capacity` (item, count, error) entries per key,
  * forever, whatever the item cardinality of the stream. The batch-side
  * counterpart is the Count-Min sketch ([[graft.ops.Sketches.cmsSketch]]);
  * Space-Saving is the right STREAMING shape because its state is a
  * bounded top-list that is itself the answer — no second pass over
  * candidate keys is needed to read the heavy hitters out.
  *
  * Guarantees (the classic Metwally et al. bounds, spec-pinned):
  * every tracked estimate over-counts by at most its recorded `error`,
  * `est - error <= true <= est`, and any item whose true count exceeds
  * total/capacity is guaranteed to be tracked. With capacity >= the
  * key's distinct-item count the summary is EXACT (errors all 0) and
  * equals the batch groupBy count.
  *
  * Determinism: Space-Saving is arrival-order sensitive when evicting,
  * and a micro-batch's iterator order is not a contract — so each batch
  * is first reduced to per-item weights in-JVM (order-free), then merged
  * into state in (weight desc, item asc) order. The result is a pure
  * function of the SEQUENCE OF BATCH MULTISETS, independent of row
  * order inside a batch and of upstream partitioning — the property the
  * replay spec pins. (Across different batch BOUNDARIES the summary may
  * differ within the error bounds — inherent to the algorithm, and the
  * bounds hold for every batching.)
  *
  * Scale posture: state per key is exactly `capacity` entries; the
  * per-batch work is one in-memory reduction of the group's rows plus a
  * capacity-sized merge. Keys scale out across executors via the
  * groupByKey exchange. The NoTimeout form holds every key forever
  * (bounded key domains); [[topKWithTtl]] evicts keys idle past a TTL,
  * the same policy split as [[StreamingDistinct]]. */
object StreamingTopK {

  /** One observation: `weight` occurrences of `item` under `key`. */
  case class Observation(key: String, item: String, weight: Long)

  /** Space-Saving state: parallel arrays (product-encoded — no kryo in
    * the state encoder), entry i = (items(i), counts(i), errors(i)). */
  case class Summary(items: Array[String], counts: Array[Long],
                     errors: Array[Long])

  /** Per-batch emission: the key's current top list, rank 1.. by
    * (count desc, item asc). */
  case class TopItem(key: String, rank: Int, item: String,
                     est: Long, error: Long)

  /** Merge one batch's (item -> weight) multiset into a summary.
    * Pure JVM function, factored out for direct spec coverage. */
  private[streaming] def merge(capacity: Int,
                               state: scala.collection.mutable.LinkedHashMap[String, (Long, Long)],
                               batch: Map[String, Long]): Unit = {
    // deterministic merge order: weight desc, then item asc
    val ordered = batch.toSeq.sortBy { case (item, w) => (-w, item) }
    ordered.foreach { case (item, w) =>
      state.get(item) match {
        case Some((c, e)) => state.update(item, (c + w, e))
        case None if state.size < capacity => state.update(item, (w, 0L))
        case None =>
          // evict the minimum-count entry (ties: item asc, so the
          // eviction victim is deterministic too)
          val (minItem, (minC, _)) = state.minBy { case (i, (c, _)) => (c, i) }
          state.remove(minItem)
          state.update(item, (minC + w, minC))
      }
    }
  }

  private def toState(s: scala.collection.mutable.LinkedHashMap[String, (Long, Long)]): Summary = {
    val arr = s.toArray.sortBy { case (i, (c, _)) => (-c, i) }
    Summary(arr.map(_._1), arr.map(_._2._1), arr.map(_._2._2))
  }

  private def fromState(s: Summary): scala.collection.mutable.LinkedHashMap[String, (Long, Long)] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < s.items.length) {
      m.update(s.items(i), (s.counts(i), s.errors(i)))
      i += 1
    }
    m
  }

  /** The state-update function, factored out so the unit spec can drive
    * it through Spark's TestGroupState. */
  private[streaming] def update(capacity: Int, k: Int)(
      key: String, rows: Iterator[Observation],
      state: GroupState[Summary]): Iterator[TopItem] = {
    val m = state.getOption.map(fromState)
      .getOrElse(scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)])
    // order-free in-batch reduction: iterator order cannot matter
    val batch = rows.foldLeft(Map.empty[String, Long]) { (acc, o) =>
      acc.updated(o.item, acc.getOrElse(o.item, 0L) + o.weight)
    }
    merge(capacity, m, batch)
    val summary = toState(m)
    state.update(summary)
    summary.items.take(k).zipWithIndex.iterator.map { case (item, i) =>
      TopItem(key, i + 1, item, summary.counts(i), summary.errors(i))
    }
  }

  /** The TTL update function: a timed-out key removes its summary and
    * emits nothing; a live key merges, re-arms its timer, and emits —
    * DELEGATING to [[update]] so in-window parity with [[topK]] is true
    * by construction. */
  private[streaming] def updateTtl(capacity: Int, k: Int, ttlMs: Long)(
      key: String, rows: Iterator[Observation],
      state: GroupState[Summary]): Iterator[TopItem] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val out = update(capacity, k)(key, rows, state)
      state.setTimeoutDuration(ttlMs)
      out
    }
  }

  /** Wire the summary onto a streaming Dataset of observations.
    * Update-mode output: the current top-`k` list of every key touched
    * in the micro-batch. Requires `k <= capacity`. */
  def topK(spark: SparkSession, obs: Dataset[Observation],
           capacity: Int, k: Int): Dataset[TopItem] = {
    import spark.implicits._
    require(k > 0 && k <= capacity,
      s"need 0 < k <= capacity, got k=$k capacity=$capacity")
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout)(update(capacity, k))
  }

  /** [[topK]] with per-key TTL eviction for unbounded key domains. */
  def topKWithTtl(spark: SparkSession, obs: Dataset[Observation],
                  capacity: Int, k: Int,
                  ttl: java.time.Duration): Dataset[TopItem] = {
    import spark.implicits._
    require(k > 0 && k <= capacity,
      s"need 0 < k <= capacity, got k=$k capacity=$capacity")
    obs.groupByKey(_.key)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.ProcessingTimeTimeout)(
        updateTtl(capacity, k, ttl.toMillis))
  }
}
