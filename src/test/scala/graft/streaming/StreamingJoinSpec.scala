package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Watermarked stream-stream interval join: in-horizon pairs match
  * (cross-batch included), out-of-horizon and wrong-key pairs do not,
  * and a row behind the watermark is dropped rather than joined. */
class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._

  case class Imp(user: String, impTs: Timestamp, impId: Long)
  case class Click(user: String, clickTs: Timestamp, clickId: Long)

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private def run(impBatches: Seq[Seq[Imp]], clickBatches: Seq[Seq[Click]])
      : Set[(Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clicks = MemoryStream[Click]
    val ckpt = java.nio.file.Files.createTempDirectory("ssj").toString
    val joined = StreamingJoin.withinHorizon(
      imps.toDF(), "impTs", clicks.toDF(), "clickTs",
      key = "user", horizonSec = 60, watermarkSec = 30)
    val q = joined.select("impId", "clickId")
      .writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").option("checkpointLocation", ckpt).start()
    try {
      val n = math.max(impBatches.size, clickBatches.size)
      (0 until n).foreach { i =>
        if (i < impBatches.size && impBatches(i).nonEmpty)
          imps.addData(impBatches(i): _*)
        if (i < clickBatches.size && clickBatches(i).nonEmpty)
          clicks.addData(clickBatches(i): _*)
        q.processAllAvailable()
      }
      spark.table("ssj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally q.stop()
  }

  test("in-horizon pairs join, cross-batch; out-of-horizon do not") {
    val got = run(
      Seq(Seq(Imp("u1", ts(100), 1L), Imp("u2", ts(100), 2L))),
      Seq(
        Seq(Click("u1", ts(130), 10L)),           // +30s: in horizon
        Seq(Click("u2", ts(200), 20L),            // +100s: out of horizon
          Click("u1", ts(90), 30L),               // before the impression
          Click("u3", ts(120), 40L))))            // no matching key
    assert(got == Set((1L, 10L)))
  }

  test("left-outer: unmatched impressions surface with null clicks " +
      "once the horizon provably closed") {
    implicit val ctx = spark.sqlContext
    val imps = MemoryStream[Imp]
    val clicks = MemoryStream[Click]
    val ckpt = java.nio.file.Files.createTempDirectory("ssjo").toString
    val joined = StreamingJoin.withinHorizonLeftOuter(
      imps.toDF(), "impTs", clicks.toDF(), "clickTs",
      key = "user", horizonSec = 60, watermarkSec = 30)
    val q = joined.selectExpr("impId", "clickId")
      .writeStream.outputMode("append").format("memory")
      .queryName("ssjo_out").option("checkpointLocation", ckpt).start()
    try {
      // u1 gets a click in horizon; u2 never does
      imps.addData(Imp("u1", ts(100), 1L), Imp("u2", ts(100), 2L))
      clicks.addData(Click("u1", ts(120), 10L))
      q.processAllAvailable()
      // advance both watermarks far past 100 + horizon + watermark so
      // u2's no-match row is provable
      imps.addData(Imp("zz", ts(5000), 99L))
      clicks.addData(Click("zz", ts(5000), 98L))
      q.processAllAvailable()
      // one more no-op batch lets the state-expiry emission drain
      imps.addData(Imp("zz2", ts(6000), 97L))
      clicks.addData(Click("zz2", ts(6000), 96L))
      q.processAllAvailable()
      val rows = spark.table("ssjo_out").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None
          else Some(r.getLong(1)))).toSet
      assert(rows.contains((1L, Some(10L))), "matched pair missing")
      assert(rows.contains((2L, None)),
        "unmatched impression never surfaced with a null click")
      assert(!rows.contains((1L, None)),
        "a matched impression must not ALSO emit a null row")
    } finally q.stop()
  }

  test("a click behind the watermark is dropped, not joined") {
    val got = run(
      Seq(
        Seq(Imp("u1", ts(100), 1L)),
        // advance BOTH watermarks far past t=160 (event time 1000)
        Seq(Imp("zz", ts(1000), 99L)),
        Seq.empty),
      Seq(
        Seq.empty,
        Seq(Click("zz", ts(1000), 98L)),
        // in-horizon for impId 1, but its event time is now far behind
        // the watermark: the state for imp 1 is evicted and the late
        // click must NOT produce a pair
        Seq(Click("u1", ts(130), 10L))))
    assert(!got.contains((1L, 10L)))
  }
}
