package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Temperature-scaled mixture quotas: alpha = 1 reproduces corpus
  * proportions, alpha = 0 is uniform, intermediate alphas up-sample the
  * tail, quotas always conserve the total, and the draw composes with
  * the quota sampler. */
class TemperatureQuotasSpec extends SparkSpec {
  import spark.implicits._

  // 160/40/10: a head stratum an order of magnitude over the tail
  private def corpus = (
    (1 to 160).map(i => (i.toLong, "en")) ++
    (161 to 200).map(i => (i.toLong, "fr")) ++
    (201 to 210).map(i => (i.toLong, "zh"))
  ).toDF("doc_id", "lang")

  test("alpha = 1 reproduces corpus proportions") {
    val q = Sampling.temperatureQuotas(corpus, col("lang"), 1.0, 21).toMap
    assert(q == Map("en" -> 16, "fr" -> 4, "zh" -> 1))
  }

  test("alpha = 0 is uniform") {
    val q = Sampling.temperatureQuotas(corpus, col("lang"), 0.0, 9).toMap
    assert(q == Map("en" -> 3, "fr" -> 3, "zh" -> 3))
  }

  test("alpha = 0.5 sits between: the tail is up-sampled, the head is not drowned") {
    // sqrt weights 12.6491/6.3246/3.1623
    val q = Sampling.temperatureQuotas(corpus, col("lang"), 0.5, 22).toMap
    assert(q.values.sum == 22)
    assert(q("en") > q("fr") && q("fr") > q("zh")) // order preserved
    // zh share rises from 1/21 (alpha=1) toward 1/3 (alpha=0)
    assert(q("zh").toDouble / 22 > 1.0 / 21)
    assert(q("en").toDouble / 22 < 160.0 / 210)
  }

  test("quotas conserve the total across alphas") {
    for (a <- Seq(0.0, 0.25, 0.5, 0.7, 1.0); t <- Seq(1, 10, 33, 97)) {
      assert(Sampling.temperatureQuotas(corpus, col("lang"), a, t)
        .map(_._2).sum == t, s"alpha=$a total=$t")
    }
  }

  test("guards: alpha out of range, empty input, NULL stratum") {
    intercept[IllegalArgumentException] {
      Sampling.temperatureQuotas(corpus, col("lang"), 1.5, 10)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureQuotas(corpus.where(lit(false)), col("lang"),
        0.5, 10)
    }
    // a NULL stratum must raise the descriptive guard, not an NPE
    val withNull = corpus.union(
      Seq((211L, null.asInstanceOf[String])).toDF("doc_id", "lang"))
    val e = intercept[IllegalArgumentException] {
      Sampling.temperatureQuotas(withNull, col("lang"), 0.5, 10)
    }
    assert(e.getMessage.contains("NULL stratum"))
  }

  test("the quota draw composes: per-stratum counts equal the quotas") {
    val q = Sampling.temperatureQuotas(corpus, col("lang"), 0.5, 22)
    val drawn = Sampling.smallestHashSampleQuotas(corpus, col("lang"),
        col("doc_id"), q)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(drawn == q.map { case (k, n) => (k, n.toLong) }.toMap)
  }
}
