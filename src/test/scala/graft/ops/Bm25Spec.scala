package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 term scoring: scalar-reference equality, the ranking properties
  * the formula exists for (idf rarity, tf saturation, length
  * normalization), and vocabulary coverage / OOV accounting. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def score(tf: Long, df: Long, n: Long,
                    dl: Double, avgdl: Double): Double =
    Seq((tf, df, n, dl, avgdl)).toDF("tf", "df", "n", "dl", "avgdl")
      .select(TextMetrics.bm25Term(col("tf"), col("df"), col("n"),
        col("dl"), col("avgdl")).as("s"))
      .collect().head.getDouble(0)

  /** The scalar reference, replaying the pinned association order. */
  private def ref(tf: Long, df: Long, n: Long,
                  dl: Double, avgdl: Double): Double = {
    val idf = BigDecimal(math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
  }

  test("bm25Term equals the scalar reference bit-for-bit") {
    for ((tf, df, n, dl, avg) <- Seq(
        (1L, 1L, 100L, 50.0, 50.0),
        (7L, 23L, 500L, 120.0, 83.5),
        (2L, 499L, 500L, 10.0, 83.5),
        (40L, 3L, 10000L, 999.0, 101.25)))
      assert(score(tf, df, n, dl, avg) == ref(tf, df, n, dl, avg))
  }

  test("rarity: a rarer term outscores a common one at equal tf/dl") {
    assert(score(3, 2, 1000, 80, 80) > score(3, 800, 1000, 80, 80))
  }

  test("saturation: tf gains diminish (concavity in tf)") {
    val s1 = score(1, 10, 1000, 80, 80)
    val s2 = score(2, 10, 1000, 80, 80)
    val s4 = score(4, 10, 1000, 80, 80)
    assert(s2 > s1 && s4 > s2)
    assert(s2 - s1 > s4 - s2) // marginal gain shrinks
    // bounded by the k1+1 asymptote
    assert(s4 < score(1000000, 10, 1000, 80, 80) * 1.0001)
  }

  test("length normalization: the same tf in a longer doc scores lower") {
    assert(score(3, 10, 1000, 40, 80) > score(3, 10, 1000, 160, 80))
  }

  test("idfBm25 stays positive even for a term in every document") {
    // ln(1 + 0.5/(N+0.5)) > 0 — the +1 smoothing removes the classic
    // negative-idf regime
    val v = Seq((1000L, 1000L)).toDF("df", "n")
      .select(TextMetrics.idfBm25(col("df"), col("n")).as("i"))
      .collect().head.getDouble(0)
    assert(v > 0.0)
  }

  test("vocabulary coverage: OOV occurrences counted against a top-V cut") {
    // corpus: "a" x6, "b" x4, "c" x3, "d" x2, "e" x1 — top-3 vocab is
    // {a, b, c}; oov occurrences = 2 + 1 = 3 of 16
    val docs = Seq(
      ("en", "a a a b b c d"),
      ("en", "a a b c e"),
      ("zh", "a b c d")).toDF("lang", "text")
    // drives the SHIPPED op (the same call the vocab_coverage query
    // makes), not a re-implementation of its dataflow
    val got = TextMetrics.vocabCoverage(docs, col("lang"), col("text"),
        v = 3)
      .orderBy(col("stratum"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
      .toSeq
    assert(got == Seq(("en", 12L, 2L, 2.0 / 12), ("zh", 4L, 1L, 0.25)))
  }

  test("vocabulary coverage: a vocab cut at least the vocabulary size " +
    "covers everything") {
    val docs = Seq(("en", "a b c"), ("zh", "b c d")).toDF("lang", "text")
    val got = TextMetrics.vocabCoverage(docs, col("lang"), col("text"),
        v = 100)
      .collect().map(r => r.getLong(2)).toSeq
    assert(got == Seq(0L, 0L))
    intercept[IllegalArgumentException] {
      TextMetrics.vocabCoverage(docs, col("lang"), col("text"), v = 0)
    }
  }
}
