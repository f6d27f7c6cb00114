package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Profile, Sketches}
import graft.streaming.StreamingProfile.ColProfile

/** Streaming column profile: cross-batch accumulation, parity with the
  * batch profiler's exact stats, parity with the batch HLL estimate
  * over the union, null/typed routing, and bounded-state arithmetic. */
class StreamingProfileSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, Option[Double], Option[String])]])
      : Map[String, ColProfile] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Option[Double], Option[String])]
    val ckpt = java.nio.file.Files.createTempDirectory("prof_ck").toString
    val latest =
      new scala.collection.concurrent.TrieMap[String, (Long, ColProfile)]()
    val q = StreamingProfile.profile(
        in.toDF().toDF("id", "x", "s"))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[ColProfile],
                       id: Long) =>
        df.collect().foreach { e =>
          latest.updateWith(e.col_name) {
            case Some((prevId, prev)) if prevId > id => Some((prevId, prev))
            case _ => Some((id, e))
          }
        }
        ()
      }
      .start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      latest.map { case (k, (_, e)) => k -> e }.toMap
    } finally q.stop()
  }

  private val b1 = Seq(
    (1L, Some(10.5), Some("a")),
    (2L, Some(-3.0), Some("b")),
    (3L, None, Some("a")))
  private val b2 = Seq(
    (4L, Some(99.25), None),
    (5L, Some(-3.0), Some("c")))

  test("running profile accumulates across batches: counts, min/max") {
    val got = run(Seq(b1, b2))
    val id = got("id")
    assert(id.n_nonnull == 5L && id.min_v.contains(1.0) &&
      id.max_v.contains(5.0))
    val x = got("x")
    assert(x.n_nonnull == 4L && x.min_v.contains(-3.0) &&
      x.max_v.contains(99.25))
    val s = got("s")
    assert(s.n_nonnull == 4L && s.min_v.isEmpty && s.max_v.isEmpty)
  }

  test("counts and min/max equal the batch profiler over the union") {
    val got = run(Seq(b1, b2))
    val union = (b1 ++ b2).toDF("id", "x", "s")
    val batch = Profile.profile(union).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(3)), Option(r.get(4)))).toMap
    for (c <- Seq("id", "x", "s")) {
      assert(got(c).n_nonnull == batch(c)._1, s"count $c")
      assert(got(c).min_v == batch(c)._2, s"min $c")
      assert(got(c).max_v == batch(c)._3, s"max $c")
    }
  }

  test("approx_distinct equals the batch sketch over the union, " +
    "bit-for-bit") {
    val got = run(Seq(b1, b2))
    def batchEst(vals: Seq[String]): Double = {
      val regs = Sketches.hllRegisters(vals.toDF("k"), col("k"), 8)
      Sketches.hllEstimate(regs, 8).collect()(0).getDouble(0)
    }
    // the stream hashes the value CAST TO STRING (mixed types, one
    // register layout) — mirror that here
    val xs = (b1 ++ b2).flatMap(_._2).map(_.toString)
    assert(got("x").approx_distinct == batchEst(xs))
    val ss = (b1 ++ b2).flatMap(_._3)
    assert(got("s").approx_distinct == batchEst(ss))
  }

  test("NaN follows Spark's aggregate ordering: never poisons min, " +
    "wins max — exact parity with the batch profiler") {
    val withNan = Seq(
      (1L, Some(Double.NaN), Some("a")),
      (2L, Some(1.5), Some("b")),
      (3L, Some(-2.0), Some("c")))
    val got = run(Seq(withNan))
    assert(got("x").min_v.contains(-2.0))
    assert(got("x").max_v.exists(_.isNaN))
    val batch = Profile.profile(withNan.toDF("id", "x", "s"), Seq("x"))
      .collect().head
    assert(got("x").min_v.contains(batch.getDouble(3)))
    assert(batch.getDouble(4).isNaN)
  }

  test("estimates are sane on a larger column (within HLL error)") {
    val big = (0 until 2000).map(i =>
      (i.toLong, Some(i % 500 * 1.0), Some(s"v${i % 137}")))
    val got = run(Seq(big))
    assert(math.abs(got("x").approx_distinct - 500) < 50)
    assert(math.abs(got("s").approx_distinct - 137) < 20)
  }
}
