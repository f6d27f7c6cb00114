package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TextMetrics

/** Streaming funnel: cross-batch accumulation and exact parity with the
  * batch rule evaluation over the union. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private val stops = Seq("the", "a", "of")
  // crafted docs: one clean (passes all), one too short, one
  // repetitive enough to fail the n-gram rule
  private val clean = ("the quick brown fox jumps over a lazy dog of " +
    "metal and the farm animals watch it daily with calm interest " +
    "while a gentle breeze moves the tall grass of the meadow " +
    "softly and the day passes without any hurry at all here") // > 40 words
  private val short = "way too short"
  private val repetitive = Array.fill(30)("spam eggs ham").mkString(" ")

  private def runStream(batches: Seq[Seq[String]]): Map[String, (Long, Long)] = {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[String]
    val ckpt = java.nio.file.Files.createTempDirectory("fun_ck").toString
    val latest =
      new scala.collection.concurrent.TrieMap[String, (Long, (Long, Long))]()
    val q = StreamingFunnel.funnel(in.toDF().toDF("text"), col("text"),
        minWords = 40, stopwords = stops)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.collect().foreach { r: Row =>
          latest.updateWith(r.getString(0)) {
            case Some((prevId, prev)) if prevId > id => Some((prevId, prev))
            case _ => Some((id, (r.getLong(1), r.getLong(2))))
          }
        }
        ()
      }
      .start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      latest.map { case (k, (_, v)) => k -> v }.toMap
    } finally q.stop()
  }

  test("running counts accumulate and match the batch rules over the " +
    "union") {
    val got = runStream(Seq(Seq(clean, short), Seq(repetitive, clean)))
    // batch reference: evaluate the SAME rules over the union
    val docs = Seq(clean, short, repetitive, clean).toDF("text")
    val flagged = docs.select(
      TextMetrics.gopherFlags(col("text"), minWords = 40,
        stopwords = stops).as("g"),
      TextMetrics.repetitionFeatures(col("text")).as("r"))
    val rules = TextMetrics.gopherRules(
      col("g.n_words"), col("g.mean_word_len"), col("g.hash_ratio"),
      col("g.ellipsis_ratio"), col("g.alpha_frac"),
      col("g.n_stopwords"), col("g.bullet_frac"),
      col("g.ellipsis_frac"), 40, 100000) :+
      ("repetition" -> (col("r.dup_ngram_frac") < 0.3))
    val want = rules.map { case (n, c) =>
      n -> flagged.where(!coalesce(c, lit(false))).count()
    }.toMap
    rules.foreach { case (n, _) =>
      assert(got(n)._1 == want(n), s"rule $n")
      assert(got(n)._2 == 4L, s"total $n")
    }
    // sanity on the crafted corpus: the short doc fails words, the
    // repetitive one fails repetition, the clean one passes everything
    assert(got("words_in_range")._1 >= 1 && got("repetition")._1 >= 1)
    assert(got("all_rules")._1 == 2L)
  }
}
