package graft.streaming

import org.apache.spark.api.java.{Optional => JOptional}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}

import graft.SparkSpec
import StreamingTopK.{Observation, Summary, TopItem}

/** Streaming Space-Saving heavy hitters: exactness when capacity covers
  * the item domain, the Metwally error bounds under eviction, in-batch
  * order invariance, and TTL eviction semantics. */
class StreamingTopKSpec extends SparkSpec {
  import spark.implicits._

  /** e2e micro-batch run; returns the LAST batch's full top list per
    * key (tracked per batchId via foreachBatch). */
  private def run(batches: Seq[Seq[Observation]], capacity: Int, k: Int)
      : Map[String, Seq[TopItem]] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Observation]
    val ckpt = java.nio.file.Files.createTempDirectory("topk_ck").toString
    val latest =
      new scala.collection.concurrent.TrieMap[String, (Long, Seq[TopItem])]()
    val q = StreamingTopK.topK(spark, in.toDS(), capacity, k)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[TopItem],
                       id: Long) =>
        df.collect().groupBy(_.key).foreach { case (key, items) =>
          latest.updateWith(key) {
            case Some((prevId, prev)) if prevId > id => Some((prevId, prev))
            case _ => Some((id, items.sortBy(_.rank).toSeq))
          }
        }
        ()
      }
      .start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      latest.map { case (key, (_, items)) => key -> items }.toMap
    } finally q.stop()
  }

  /** Drive the update function over batches directly (NoTimeout). */
  private def drive(batches: Seq[Seq[Observation]], capacity: Int, k: Int)
      : Seq[TopItem] = {
    var prev: Option[Summary] = None
    var out: Seq[TopItem] = Seq.empty
    batches.foreach { b =>
      val s = TestGroupState.create[Summary](
        prev.map(JOptional.of[Summary]).getOrElse(JOptional.empty[Summary]()),
        GroupStateTimeout.NoTimeout, batchProcessingTimeMs = 0L,
        eventTimeWatermarkMs = JOptional.empty[Long](), hasTimedOut = false)
      out = StreamingTopK.update(capacity, k)("k", b.iterator, s).toSeq
      prev = Some(s.get)
    }
    out
  }

  test("capacity >= item domain: exact counts across batches, zero error") {
    val b1 = Seq.tabulate(60)(i => Observation("a", s"t${i % 5}", 1L)) ++
      Seq.tabulate(20)(i => Observation("b", s"u${i % 3}", 2L))
    val b2 = Seq.tabulate(45)(i => Observation("a", s"t${i % 9}", 1L))
    val got = run(Seq(b1, b2), capacity = 16, k = 16)
    // batch truth: groupBy key,item sum(weight)
    val truth = (b1 ++ b2).groupBy(o => (o.key, o.item))
      .view.mapValues(_.map(_.weight).sum).toMap
    got.foreach { case (key, items) =>
      items.foreach { it =>
        assert(it.error == 0L)
        assert(it.est == truth((key, it.item)),
          s"$key/${it.item}: ${it.est} != ${truth((key, it.item))}")
      }
      // the list is complete and rank-ordered by (count desc, item asc)
      val expect = truth.collect { case ((`key`, item), c) => (item, c) }
        .toSeq.sortBy { case (i, c) => (-c, i) }
      assert(items.map(it => (it.item, it.est)) == expect)
    }
  }

  test("under eviction the Metwally bounds hold and heavy items survive") {
    // zipf-ish: item i has true count max(1, 2000 >> i), 40 items,
    // capacity 12 — heavy head far above total/capacity must be tracked
    val rnd = new scala.util.Random(1)
    val obs = rnd.shuffle((0 until 40).flatMap { i =>
      Seq.fill(math.max(1, 2000 >> i))(Observation("k", f"i$i%02d", 1L))
    }.toList)
    val batches = obs.grouped(800).toSeq
    val out = drive(batches, capacity = 12, k = 12)
    val truth = obs.groupBy(_.item).view.mapValues(_.size.toLong).toMap
    val total = obs.size.toLong
    out.foreach { it =>
      val t = truth(it.item)
      assert(it.est >= t, s"${it.item}: est ${it.est} < true $t")
      assert(it.est - it.error <= t,
        s"${it.item}: est-err ${it.est - it.error} > true $t")
    }
    // guaranteed tracking: true count > total/capacity => in the summary
    val tracked = out.map(_.item).toSet
    truth.filter(_._2 > total / 12).keys.foreach { heavy =>
      assert(tracked.contains(heavy), s"heavy item $heavy evicted")
    }
  }

  test("result is invariant to row order within a batch") {
    val rnd = new scala.util.Random(7)
    val batch = (0 until 30).flatMap { i =>
      Seq.fill(1 + (i * 13) % 17)(Observation("k", s"x$i", 1L))
    }
    val a = drive(Seq(batch), capacity = 8, k = 8)
    val b = drive(Seq(rnd.shuffle(batch.toList)), capacity = 8, k = 8)
    assert(a == b)
  }

  test("summary survives a query restart from the checkpoint") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Observation]
    val ckpt = java.nio.file.Files.createTempDirectory("topk_rs").toString
    val latest =
      new scala.collection.concurrent.TrieMap[String, (Long, Seq[TopItem])]()
    def startQuery() = StreamingTopK.topK(spark, in.toDS(), 16, 16)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[TopItem],
                       id: Long) =>
        df.collect().groupBy(_.key).foreach { case (key, items) =>
          latest.updateWith(key) {
            case Some((prevId, prev)) if prevId > id => Some((prevId, prev))
            case _ => Some((id, items.sortBy(_.rank).toSeq))
          }
        }
        ()
      }.start()
    // the two batches count DISJOINT items plus a shared one: losing
    // state at restart would forget batch 1's items and under-count
    // the shared item
    val q1 = startQuery()
    try {
      in.addData(Seq.fill(7)(Observation("r", "shared", 1L)) ++
        Seq.fill(4)(Observation("r", "only1", 1L)): _*)
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = startQuery()
    try {
      in.addData(Seq.fill(5)(Observation("r", "shared", 1L)) ++
        Seq.fill(9)(Observation("r", "only2", 1L)): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(latest("r")._2.map(it => (it.item, it.est)) ==
      Seq(("shared", 12L), ("only2", 9L), ("only1", 4L)))
  }

  test("ttl: eviction drops the summary; a returning key starts fresh") {
    val ttlMs = 60000L
    def obs(items: (String, Int)*): Seq[Observation] =
      items.flatMap { case (i, n) => Seq.fill(n)(Observation("k", i, 1L)) }
    val s1 = TestGroupState.create[Summary](JOptional.empty[Summary](),
      GroupStateTimeout.ProcessingTimeTimeout, batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = JOptional.empty[Long](), hasTimedOut = false)
    val out1 = StreamingTopK.updateTtl(8, 8, ttlMs)(
      "k", obs("a" -> 10, "b" -> 3).iterator, s1).toSeq
    assert(out1.map(it => (it.item, it.est)) == Seq(("a", 10L), ("b", 3L)))
    assert(s1.getTimeoutTimestampMs.get() == 1000L + ttlMs)
    val s2 = TestGroupState.create[Summary](JOptional.of(s1.get),
      GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L + ttlMs + 1,
      eventTimeWatermarkMs = JOptional.empty[Long](), hasTimedOut = true)
    val out2 = StreamingTopK.updateTtl(8, 8, ttlMs)(
      "k", Iterator.empty, s2).toSeq
    assert(out2.isEmpty && s2.isRemoved)
    val s3 = TestGroupState.create[Summary](JOptional.empty[Summary](),
      GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 2000L + ttlMs,
      eventTimeWatermarkMs = JOptional.empty[Long](), hasTimedOut = false)
    val out3 = StreamingTopK.updateTtl(8, 8, ttlMs)(
      "k", obs("c" -> 2).iterator, s3).toSeq
    assert(out3.map(it => (it.item, it.est)) == Seq(("c", 2L)),
      "post-eviction summary must reflect only new observations")
  }
}
