package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic sampling: rerun/partitioning stability, per-stratum
  * rates and exact-N counts, growth stability of the smallest-hash draw.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) = (0 until n)
    .map(i => (i.toLong, if (i % 3 == 0) "en" else "de"))
    .toDF("id", "lang")

  test("stratified sample is a deterministic pure filter") {
    val d = docs(3000)
    val pick = Sampling.stratifiedSample(d, col("lang"), col("id"),
      Map("en" -> 0.1), defaultRate = 0.5)
    val ids1 = pick.select("id").as[Long].collect().sorted.toSeq
    // same rows under a different partitioning
    val ids2 = Sampling.stratifiedSample(d.repartition(7), col("lang"),
        col("id"), Map("en" -> 0.1), defaultRate = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
    // rates land near the targets (hash uniformity, wide tolerance)
    val en = pick.where($"lang" === "en").count().toDouble / 1000
    val de = pick.where($"lang" === "de").count().toDouble / 2000
    assert(en > 0.05 && en < 0.15, s"en rate $en")
    assert(de > 0.4 && de < 0.6, s"de rate $de")
    // membership is exactly the bucket predicate, row by row
    val viol = d.withColumn("b", Sampling.hashBucket(col("id"), 1000))
      .withColumn("want", when($"lang" === "en", $"b" < 100)
        .otherwise($"b" < 500))
      .join(pick.select($"id".as("pid")), $"id" === $"pid", "left")
      .where($"want" =!= $"pid".isNotNull)
    assert(viol.count() == 0)
  }

  test("rate cutoff is the rounded integer, not the raw float product " +
      "(0.07 * 100 == 7.000000000000001 must keep 7 buckets, not 8)") {
    val d = docs(4000)
    val pick = Sampling.stratifiedSample(d, col("lang"), col("id"),
      Map.empty, defaultRate = 0.07, buckets = 100)
    val maxBucket = pick
      .select(Sampling.hashBucket(col("id"), 100).as("b"))
      .agg(max($"b")).as[Long].collect()(0)
    assert(maxBucket <= 6, s"bucket $maxBucket admitted by 7% rate")
  }

  test("smallest-hash sample: exactly N per stratum, stable under growth") {
    val small = Sampling.smallestHashSample(docs(1000), col("lang"),
      col("id"), n = 25)
    val counts = small.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(counts == Map("en" -> 25L, "de" -> 25L))
    // ranks are 1..N with no holes
    val ranks = small.where($"lang" === "en").select("sample_rank")
      .as[Int].collect().sorted.toSeq
    assert(ranks == (1 to 25))
    // growing the table only evicts rows for smaller hashes: the id<1000
    // subset of the grown sample equals the grown sample minus new rows,
    // and every survivor was in the small sample
    val grown = Sampling.smallestHashSample(docs(2000), col("lang"),
        col("id"), n = 25)
      .where($"id" < 1000).select("id").as[Long].collect().toSet
    val orig = small.select("id").as[Long].collect().toSet
    assert(grown.subsetOf(orig))
  }

  test("two-phase smallest-hash sample == window form, any partitioning") {
    // skewed strata: one giant, one tiny — the shape the window form's
    // per-stratum partitions choke on and the two-phase form was built
    // for. Equivalence must hold row-for-row INCLUDING sample_rank.
    val d = (0 until 5000).map(i =>
        (i.toLong, if (i % 50 == 0) "tiny" else "big"))
      .toDF("id", "lang")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("lang", "id", "sample_rank").as[(String, Long, Int)]
        .collect().sorted.toSeq
    val window = canon(Sampling.smallestHashSample(
      d, col("lang"), col("id"), n = 20))
    val twoPhase = canon(Sampling.smallestHashSampleTwoPhase(
      d, col("lang"), col("id"), n = 20))
    assert(twoPhase == window)
    // many partitions => many partial buffers => the merge path runs
    val sharded = canon(Sampling.smallestHashSampleTwoPhase(
      d.repartition(17), col("lang"), col("id"), n = 20))
    assert(sharded == window)
    // output schema matches the window form (df.* then sample_rank)
    assert(Sampling.smallestHashSampleTwoPhase(
        d, col("lang"), col("id"), 3).columns.toSeq ==
      Seq("id", "lang", "sample_rank"))
  }

  test("two-phase: NULL strata sample like any other stratum") {
    // review finding (r8): a plain equi-join would drop the null
    // stratum's sampled rows (NULL === NULL is NULL); the null-safe
    // join must keep them, exactly as the window form partitions null
    val d = (0 until 600)
      .map(i => (i.toLong, if (i % 3 == 0) null else "x"))
      .toDF("id", "lang")
    def canonN(df: org.apache.spark.sql.DataFrame) =
      df.select("lang", "id", "sample_rank").collect()
        .map(r => (Option(r.getString(0)).getOrElse("<null>"),
          r.getLong(1), r.getInt(2))).sorted.toSeq
    val window = canonN(Sampling.smallestHashSample(
      d, col("lang"), col("id"), n = 15))
    val twoPhase = canonN(Sampling.smallestHashSampleTwoPhase(
      d, col("lang"), col("id"), n = 15))
    assert(twoPhase == window)
    assert(twoPhase.count(_._1 == "<null>") == 15)
  }

  test("two-phase: a pre-existing sample_rank column is replaced") {
    val d = (0 until 300).map(i => (i.toLong, "s")).toDF("id", "lang")
      .withColumn("sample_rank", lit(99))
    val got = Sampling.smallestHashSampleTwoPhase(
      d, col("lang"), col("id"), n = 5)
    assert(got.columns.count(_ == "sample_rank") == 1)
    assert(got.select("sample_rank").as[Int].collect().sorted.toSeq ==
      (1 to 5))
  }

  test("two-phase: n larger than a stratum keeps the whole stratum") {
    val d = (0 until 40).map(i => (i.toLong, if (i < 8) "xs" else "big"))
      .toDF("id", "lang")
    val got = Sampling.smallestHashSampleTwoPhase(
      d, col("lang"), col("id"), n = 10)
    val counts = got.groupBy("lang").count().as[(String, Long)]
      .collect().toMap
    assert(counts == Map("xs" -> 8L, "big" -> 10L))
    val ranks = got.where($"lang" === "xs").select("sample_rank")
      .as[Int].collect().sorted.toSeq
    assert(ranks == (1 to 8))
  }

  test("weighted: prob 0 keeps nothing, prob 1 keeps everything") {
    val df = docs(500)
    assert(Sampling.weightedSample(df, col("id"), lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(df, col("id"), lit(1.0)).count() == 500)
    // out-of-range probs clamp rather than throw
    assert(Sampling.weightedSample(df, col("id"), lit(7.5)).count() == 500)
    assert(Sampling.weightedSample(df, col("id"), lit(-2.0)).count() == 0)
    // null prob reads as 0 (excluded), non-null rows keep their coin
    val mixed = df.withColumn("p",
      when(col("id") < 100, lit(1.0)).otherwise(lit(null).cast("double")))
    assert(Sampling.weightedSample(mixed, col("id"), col("p"))
      .count() == 100)
  }

  test("weighted: kept set grows monotonically with prob") {
    val df = docs(2000)
    val kept = Seq(0.1, 0.3, 0.6, 0.9).map { p =>
      Sampling.weightedSample(df, col("id"), lit(p))
        .select("id").as[Long].collect().toSet
    }
    kept.sliding(2).foreach { case Seq(lo, hi) =>
      assert(lo.subsetOf(hi), s"${lo.size} not subset of ${hi.size}")
    }
    // keep rate tracks prob (binomial, n=2000: +-4 sigma band)
    kept.zip(Seq(0.1, 0.3, 0.6, 0.9)).foreach { case (s, p) =>
      val sigma = math.sqrt(2000 * p * (1 - p))
      assert(math.abs(s.size - 2000 * p) < 4 * sigma,
        s"rate ${s.size / 2000.0} too far from $p")
    }
  }

  test("weighted: per-row varying prob is deterministic across partitionings") {
    val df = docs(1000).withColumn("p", (col("id") % 100) / lit(100.0))
    val a = Sampling.weightedSample(df.repartition(1), col("id"), col("p"))
      .select("id").as[Long].collect().toSet
    val b = Sampling.weightedSample(df.repartition(13), col("id"), col("p"))
      .select("id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
