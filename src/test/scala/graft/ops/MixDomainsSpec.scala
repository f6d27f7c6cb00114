package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hamilton apportionment + per-stratum quota sampling: slot
  * conservation, remainder and tie handling, the loud weight guards,
  * and the quota draw's equivalence with independent per-stratum
  * exact-N draws. */
class MixDomainsSpec extends SparkSpec {
  import spark.implicits._

  test("apportionment conserves slots and follows largest remainders") {
    // equal thirds of 10: floors 3+3+3, one leftover, remainders tie at
    // 1/3 — the key order breaks the tie
    assert(Sampling.apportion(Seq("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), 10)
      == Seq("a" -> 4, "b" -> 3, "c" -> 3))
    // exact proportions: no remainders to distribute
    assert(Sampling.apportion(Seq("x" -> 0.5, "y" -> 0.25, "z" -> 0.25), 8)
      == Seq("x" -> 4, "y" -> 2, "z" -> 2))
    // slot conservation on awkward weights
    val got = Sampling.apportion(Seq("en" -> 0.35, "es" -> 0.2,
      "de" -> 0.2, "fr" -> 0.15, "zh" -> 0.1), 50)
    assert(got.map(_._2).sum == 50)
    assert(got.forall(_._2 >= 0))
  }

  test("apportionment guards: empty, non-positive, duplicate strata") {
    intercept[IllegalArgumentException] { Sampling.apportion(Nil, 5) }
    intercept[IllegalArgumentException] {
      Sampling.apportion(Seq("a" -> 0.0, "b" -> 1.0), 5) }
    intercept[IllegalArgumentException] {
      Sampling.apportion(Seq("a" -> 1.0, "a" -> 2.0), 5) }
  }

  test("a non-4-dp-exact weight sum fails loudly instead of misallocating") {
    // thirds: the rounded normalizer (0.9999) understates the true sum,
    // every quotient overdraws, floors sum to 30003 > 30000 — without
    // the conservation guard this would silently return 30003 slots
    val e = intercept[IllegalArgumentException] {
      Sampling.apportion(Seq("a" -> 1.0 / 3, "b" -> 1.0 / 3,
        "c" -> 1.0 / 3), 30000)
    }
    assert(e.getMessage.contains("imbalance"))
    // weights below the 4-dp resolution round the normalizer to zero
    intercept[IllegalArgumentException] {
      Sampling.apportion(Seq("a" -> 4e-5, "b" -> 4e-5), 10)
    }
    // the documented renormalization passes and conserves exactly
    val ok = Sampling.apportion(Seq("a" -> 0.3333, "b" -> 0.3333,
      "c" -> 0.3334), 30000)
    assert(ok.map(_._2).sum == 30000)
  }

  private lazy val corpus = {
    val rnd = new scala.util.Random(20260814)
    (0 until 600).map { i =>
      val s = Seq("en", "es", "de", "zh")(rnd.nextInt(4))
      (s, i.toLong)
    }.toDF("lang", "id").repartition(11, col("id"))
  }

  test("quota draw == independent per-stratum exact-N draws") {
    val quotas = Seq("en" -> 7, "es" -> 3, "de" -> 12)
    val got = Sampling.smallestHashSampleQuotas(corpus, col("lang"),
        col("id"), quotas)
      .select("lang", "sample_rank", "id").as[(String, Int, Long)]
      .collect().toSeq.sorted
    val want = quotas.flatMap { case (lang, n) =>
      Sampling.smallestHashSampleTwoPhase(
          corpus.where(col("lang") === lang), col("lang"), col("id"), n)
        .select("lang", "sample_rank", "id").as[(String, Int, Long)]
        .collect().toSeq
    }.sorted
    assert(got == want)
    assert(got.count(_._1 == "en") == 7 && got.count(_._1 == "de") == 12)
    assert(!got.exists(_._1 == "zh"), "strata without a quota are excluded")
  }

  test("a stratum smaller than its quota contributes everything it has") {
    val tiny = Seq(("rare", 1L), ("rare", 2L), ("big", 3L), ("big", 4L),
      ("big", 5L)).toDF("lang", "id")
    val got = Sampling.smallestHashSampleQuotas(tiny, col("lang"),
        col("id"), Seq("rare" -> 10, "big" -> 1))
      .select("lang", "id").as[(String, Long)].collect().toSeq.sorted
    assert(got.count(_._1 == "rare") == 2 && got.count(_._1 == "big") == 1)
  }
}
