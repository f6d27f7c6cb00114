package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Sessions
import StreamingSessions.{ClosedSession, OpenSession, Pending, SessionEvent}

/** Streaming sessionization: watermark-gated emission, cross-batch
  * continuation, beyond-gap disorder (the case eager emission gets
  * wrong), and batch parity on the same events. */
class StreamingSessionsSpec extends SparkSpec {
  import spark.implicits._

  private val Gap = 1000000000L // 1 s in ns
  // all event times sit an hour past the epoch: the initial watermark is
  // 0, and a row AT the watermark is dropped as late by the stateful op
  private val T0 = 3600L * 1000000000L

  /** Run a list of micro-batches through the sessionizer, then flush
    * with far-future dummy events (key -1) so the watermark passes every
    * real session's end + gap. */
  private def run(batches: Seq[Seq[SessionEvent]], name: String,
                  watermark: String = "30 seconds"): Seq[ClosedSession] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("sess_ck").toString
    val q = StreamingSessions
      .closedSessions(spark, in.toDS(), Gap, watermark)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      // two flush batches: one to advance the watermark, one to run the
      // timeout eviction under the advanced watermark
      val far = T0 + 100000L * Gap
      in.addData(SessionEvent(-1L, far, 0.0)); q.processAllAvailable()
      in.addData(SessionEvent(-1L, far + 1, 0.0)); q.processAllAvailable()
      spark.table(name).as[ClosedSession].collect().toSeq
        .filter(_.key >= 0).sortBy(c => (c.key, c.startNs))
    } finally q.stop()
  }

  test("gap rule splits sessions; watermark finalizes them") {
    val out = run(Seq(Seq(
      SessionEvent(1, T0, 1.0), SessionEvent(1, T0 + 500000000L, 2.0),
      // 2.5 s later: > gap, new session
      SessionEvent(1, T0 + 3000000000L, 4.0))), "sess_gap")
    assert(out == Seq(
      ClosedSession(1, T0, T0 + 500000000L, 500000000L, 2, 3.0),
      ClosedSession(1, T0 + 3000000000L, T0 + 3000000000L, 0L, 1, 4.0)))
  }

  test("a session continues across micro-batches before closing") {
    val out = run(Seq(
      Seq(SessionEvent(2, T0, 1.0)),
      Seq(SessionEvent(2, T0 + 800000000L, 2.0)), // within gap: same
      Seq(SessionEvent(2, T0 + 5000000000L, 4.0))), "sess_xbatch")
    assert(out == Seq(
      ClosedSession(2, T0, T0 + 800000000L, 800000000L, 2, 3.0),
      ClosedSession(2, T0 + 5000000000L, T0 + 5000000000L, 0L, 1, 4.0)))
  }

  test("disorder BEYOND the open session's gap still matches batch: a " +
      "late event between two sessions forms its own session") {
    // eager emission gets this wrong: it closes [T0,T0] when T0+100s
    // arrives, then absorbs the T0+50s straggler into the WRONG session
    val out = run(Seq(
      Seq(SessionEvent(4, T0, 1.0),
        SessionEvent(4, T0 + 100L * Gap, 2.0)),
      Seq(SessionEvent(4, T0 + 50L * Gap, 8.0))), // 50 s late, < 60 s wm
      "sess_disorder", watermark = "60 seconds")
    assert(out == Seq(
      ClosedSession(4, T0, T0, 0L, 1, 1.0),
      ClosedSession(4, T0 + 50L * Gap, T0 + 50L * Gap, 0L, 1, 8.0),
      ClosedSession(4, T0 + 100L * Gap, T0 + 100L * Gap, 0L, 1, 2.0)))
  }

  test("a late event bridging two pending sessions merges them") {
    val out = run(Seq(
      Seq(SessionEvent(5, T0, 1.0),
        SessionEvent(5, T0 + 2L * Gap, 2.0)), // two pending singletons
      Seq(SessionEvent(5, T0 + Gap, 4.0))),    // bridges both
      "sess_bridge", watermark = "60 seconds")
    assert(out == Seq(
      ClosedSession(5, T0, T0 + 2L * Gap, 2L * Gap, 3, 7.0)))
  }

  test("closed sessions equal the batch sessionStats on the same events") {
    val events = for {
      key <- 1L to 3L
      i <- 0 until 12
    } yield SessionEvent(key,
      T0 + i * 600000000L * key + (if (i >= 6) 4L * Gap else 0L), 0.25 * i)
    // stream them in time order, three events per micro-batch
    val out = run(events.sortBy(_.tNs).grouped(3).toSeq, "sess_parity")
    val batch = Sessions.sessionStats(
        events.toDF("key", "t", "v"), Seq("key"), col("t"), Gap,
        valueCol = col("v"))
      .select(col("key"), col("start_ns").as("startNs"),
        col("end_ns").as("endNs"), col("duration_ns").as("durationNs"),
        col("n"), col("value_sum").as("valueSum"))
      .as[ClosedSession].collect().toSeq.sortBy(c => (c.key, c.startNs))
    assert(out == batch)
  }

  test("pending state survives a query restart from the checkpoint: a " +
      "session spanning the stop/start boundary emits once, merged") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[SessionEvent]
    val ckpt = java.nio.file.Files.createTempDirectory("sess_rs").toString
    // parquet sink: the memory sink refuses checkpoint recovery
    val outDir = java.nio.file.Files.createTempDirectory("sess_rso").toString
    def startQuery() = StreamingSessions
      .closedSessions(spark, in.toDS(), Gap, "30 seconds")
      .writeStream.format("parquet").option("path", outDir)
      .outputMode("append").option("checkpointLocation", ckpt).start()
    val q1 = startQuery()
    try {
      in.addData(SessionEvent(9, T0, 1.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart against the SAME checkpoint: the open session must come
    // back from the state store, absorb the next event, and finalize
    val q2 = startQuery()
    try {
      in.addData(SessionEvent(9, T0 + 800000000L, 2.0))
      q2.processAllAvailable()
      val far = T0 + 100000L * Gap
      in.addData(SessionEvent(-1L, far, 0.0)); q2.processAllAvailable()
      in.addData(SessionEvent(-1L, far + 1, 0.0)); q2.processAllAvailable()
      val out = spark.read.parquet(outDir).as[ClosedSession].collect()
        .toSeq.filter(_.key >= 0)
      assert(out == Seq(
        ClosedSession(9, T0, T0 + 800000000L, 800000000L, 2, 3.0)))
    } finally q2.stop()
  }

  test("update(): intervals re-merge regardless of arrival order, and " +
      "nothing emits below the watermark") {
    val st = new FakeGroupState[Pending]
    val first = StreamingSessions.update(Gap)(7L,
      Iterator(SessionEvent(7, T0 + 1000L, 1.0)), st).toSeq
    assert(first.isEmpty && st.get.sessions.map(_.n) == List(1))
    val second = StreamingSessions.update(Gap)(7L,
      Iterator(SessionEvent(7, T0 + 400L, 2.0)), st).toSeq
    assert(second.isEmpty)
    assert(st.get.sessions ==
      List(OpenSession(T0 + 400L, T0 + 1000L, 2, 3.0)))
  }

  test("mergeAll closure: order-independent, gap-inclusive boundary") {
    val a = OpenSession(0L, 10L, 1, 1.0)
    val b = OpenSession(10L + Gap, 10L + Gap, 1, 2.0) // exactly gap: join
    val c = OpenSession(5L * Gap, 6L * Gap, 2, 4.0)
    val expected = List(
      OpenSession(0L, 10L + Gap, 2, 3.0), c)
    assert(StreamingSessions.mergeAll(Seq(a, b, c), Gap) == expected)
    assert(StreamingSessions.mergeAll(Seq(c, b, a), Gap) == expected)
  }
}

/** Minimal GroupState for driving the update function in-process. */
class FakeGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  private var v: Option[S] = None
  override def exists: Boolean = v.isDefined
  override def get: S = v.get
  override def getOption: Option[S] = v
  override def update(s: S): Unit = { v = Some(s) }
  override def remove(): Unit = { v = None }
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(d: Long): Unit = ()
  override def setTimeoutDuration(d: String): Unit = ()
  override def setTimeoutTimestamp(t: Long): Unit = ()
  override def setTimeoutTimestamp(t: Long, add: String): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
