package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** DSIR-style importance resampling pieces: cross-corpus unigram scoring
  * with OOV smoothing, and the log-space Bernoulli coin (no exp). */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("unigramLogprobAgainst: hand-computed with OOV smoothing") {
    // reference: 4 tokens total, "a" x3, "b" x1
    val ref = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val docs = Seq((10L, "a b z")).toDF("doc_id", "text")
    val r = TextMetrics.unigramLogprobAgainst(docs, "doc_id", "text",
      ref, "text").collect()(0)
    def lp(x: Double) = java.math.BigDecimal.valueOf(math.log(x))
      .setScale(6, java.math.RoundingMode.HALF_UP)
    // ln(3/4), ln(1/4), and the OOV floor ln(1/(4+1))
    val want = Seq(lp(3.0 / 4), lp(1.0 / 4), lp(1.0 / 5))
      .reduce(_ add _).doubleValue() / 3
    assert(r.getDouble(1) == want && r.getLong(2) == 3L)
  }

  test("against the corpus itself it equals unigramLogprob") {
    val docs = Seq((1L, "x y x"), (2L, "y z"), (3L, "x z z"))
      .toDF("doc_id", "text")
    val a = TextMetrics.unigramLogprob(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = TextMetrics.unigramLogprobAgainst(docs, "doc_id", "text",
      docs, "text").orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("unigramLogRatio equals the two-call composition bit-for-bit") {
    val docs = Seq((1L, "x y x q"), (2L, "y z"), (3L, "x z z w"))
      .toDF("doc_id", "text")
    val target = Seq((10L, "x y y"), (11L, "z x")).toDF("doc_id", "text")
    val merged = TextMetrics.unigramLogRatio(docs, "doc_id", "text",
        target, "text")
      .select("doc_id", "lp_s", "lp_t", "n_tokens")
      .orderBy("doc_id").collect().toSeq
    val src = TextMetrics.unigramLogprob(docs, "doc_id", "text")
    val tgt = TextMetrics.unigramLogprobAgainst(docs, "doc_id", "text",
      target, "text")
    val composed = src.select(col("doc_id"),
        col("avg_logprob").as("lp_s"), col("n_tokens"))
      .join(tgt.select(col("doc_id"), col("avg_logprob").as("lp_t")),
        "doc_id")
      .select("doc_id", "lp_s", "lp_t", "n_tokens")
      .orderBy("doc_id").collect().toSeq
    assert(merged == composed)
  }

  test("bigramLogprob: hand-computed conditional MLE") {
    // corpus bigrams: "a b" x2, "b a" x1, "b c" x1
    //   cPrefix(a)=2, cPrefix(b)=2
    //   p(b|a) = 2/2 = 1 -> lp 0;  p(a|b) = 1/2;  p(c|b) = 1/2
    val docs = Seq((1L, "a b a b c"), (2L, "solo")).toDF("doc_id", "text")
    val r = TextMetrics.bigramLogprob(docs, "doc_id", "text").collect()
    assert(r.length == 1, "a single-token doc has no bigram to score")
    def lp(x: Double) = java.math.BigDecimal.valueOf(math.log(x))
      .setScale(6, java.math.RoundingMode.HALF_UP)
    // doc 1 bigrams: (a b), (b a), (a b), (b c)
    val want = Seq(lp(1.0), lp(0.5), lp(1.0), lp(0.5))
      .reduce(_ add _).doubleValue() / 4
    assert(r(0).getLong(0) == 1L && r(0).getDouble(1) == want &&
      r(0).getLong(2) == 4L)
  }

  test("logWeightedSample: coin semantics in log space") {
    val df = (0L until 4000L).toDF("id")
    // logProb 0 => min(1, e^0) = 1: kept UNCONDITIONALLY (the >= 0
    // special case — the strict coin alone would drop a u = 2^32-1 row)
    val all = Sampling.logWeightedSample(df, col("id"), lit(0.0)).count()
    assert(all == 4000)
    // positive logProb is the same certainty
    assert(Sampling.logWeightedSample(df, col("id"), lit(2.5)).count()
      == 4000)
    // ln(0.5): keep about half
    val half = Sampling.logWeightedSample(df, col("id"),
      lit(math.log(0.5))).count()
    assert(half > 1700 && half < 2300, s"half-coin kept $half of 4000")
    // null excludes
    assert(Sampling.logWeightedSample(df, col("id"),
      lit(null).cast("double")).count() == 0)
    // monotone: a larger logProb keeps a superset
    val lo = Sampling.logWeightedSample(df, col("id"), lit(-1.5))
      .collect().map(_.getLong(0)).toSet
    val hi = Sampling.logWeightedSample(df, col("id"), lit(-0.5))
      .collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi))
  }

  test("log coin agrees with the linear-space weightedSample coin") {
    // same hash, same cutoff semantics: P(keep) for logProb = ln(p)
    // must match weightedSample(p) on all but rounding-boundary rows
    val df = (0L until 5000L).toDF("id")
    val p = 0.37
    val lin = Sampling.weightedSample(df, col("id"), lit(p))
      .collect().map(_.getLong(0)).toSet
    val log = Sampling.logWeightedSample(df, col("id"), lit(math.log(p)))
      .collect().map(_.getLong(0)).toSet
    // the two coins discretize differently (floor vs rounded-ln
    // comparison); agreement must still be near-total
    val sym = (lin diff log).size + (log diff lin).size
    assert(sym <= 5, s"coins disagree on $sym of 5000 rows")
  }
}
