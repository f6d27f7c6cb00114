package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** CCNet-style per-language perplexity terciles: tercile sizes, the
  * within-language score monotonicity head >= middle >= tail, the
  * per-language (not global) cut, identical-score ties landing in one
  * bucket, and partitioning invariance. */
class QualityBucketsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    val langs = Seq("en", "de", "zh")
    // vocabulary with a frequency gradient: common words score high,
    // rare words low — so per-doc scores spread
    (0 until n).map { i =>
      val lang = langs(i % 3)
      val words = (0 until 8 + rnd.nextInt(12)).map { _ =>
        s"${lang}w${(math.sqrt(rnd.nextInt(400)).toInt)}"
      }
      (i.toLong, words.mkString(" "), lang)
    }.toDF("doc_id", "text", "lang")
  }

  private def run(df: org.apache.spark.sql.DataFrame) =
    TextMetrics.qualityBuckets(df, "doc_id", "text", "lang")
      .select("doc_id", "lang", "score", "bucket")
      .as[(Long, String, Double, String)].collect().toSeq.sortBy(_._1)

  test("terciles are near-equal thirds per language") {
    val got = run(corpus(20260815, 300))
    assert(got.size == 300)
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val byBucket = rows.groupBy(_._4).view.mapValues(_.size).toMap
      assert(byBucket.keySet == Set("head", "middle", "tail"),
        s"$lang has all three buckets")
      // ties on the 6-dp grid can shift counts; each bucket still holds
      // a substantial share of the language
      byBucket.values.foreach(c => assert(c >= rows.size / 6,
        s"$lang bucket sizes $byBucket"))
    }
  }

  test("within a language: every head score >= every middle >= every tail") {
    val got = run(corpus(7, 240))
    got.groupBy(_._2).foreach { case (lang, rows) =>
      def scores(b: String) = rows.filter(_._4 == b).map(_._3)
      val (h, m, t) = (scores("head"), scores("middle"), scores("tail"))
      assert(h.min >= m.max || m.isEmpty, s"$lang head/middle overlap")
      assert(m.min >= t.max || t.isEmpty, s"$lang middle/tail overlap")
    }
  }

  test("the cut is per-language, not global") {
    // lang A's vocabulary is tiny (every word very common -> high
    // scores); lang B's is huge (every word rare -> low scores). A
    // global cut would file ALL of B as tail; the per-language cut
    // still gives B its own head third.
    val a = (0L until 30L).map(i => (i, "aa aa aa aa", "A"))
    val rnd = new scala.util.Random(5)
    val b = (100L until 130L).map { i =>
      (i, (0 until 6).map(_ => s"b${rnd.nextInt(500)}").mkString(" "), "B")
    }
    val got = run((a ++ b).toDF("doc_id", "text", "lang"))
    val bBuckets = got.filter(_._2 == "B").map(_._4).toSet
    assert(bBuckets.contains("head"), "lang B keeps its own head third")
  }

  test("identical scores land in one bucket") {
    // every doc in the language has the same text -> same score; the
    // tercile boundaries equal that score, so >= files ALL as head
    val df = (0L until 12L).map(i => (i, "x x x", "en"))
      .toDF("doc_id", "text", "lang")
    val got = run(df)
    assert(got.map(_._4).distinct == Seq("head"))
  }

  test("partitioning invariance") {
    val base = corpus(42, 180)
    val a = run(base.repartition(3, col("doc_id")))
    val b = run(base.repartition(23, col("lang")))
    assert(a == b && a.nonEmpty)
  }
}
