package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Efraimidis–Spirakis weighted exact-N: the window-form reference
  * equivalence, weight-proportional selection pressure, the exact-N
  * contract, loud weight guards, and determinism under repartitioning. */
class WeightedExactNSpec extends SparkSpec {
  import spark.implicits._

  test("equals the direct window-form A-ES ranking") {
    val rnd = new scala.util.Random(20260814)
    val df = (0 until 500).map(i =>
        (s"g${i % 3}", i.toLong, 1.0 + rnd.nextInt(50)))
      .toDF("g", "id", "w")
    val got = Sampling.weightedSampleExactN(df, col("g"), col("id"),
        col("w"), n = 9)
      .select("g", "sample_rank", "id").orderBy("g", "sample_rank")
      .collect().toSeq
    val unit = pmod(xxhash64(col("id")), lit(1L << 32))
    val key = round(log((unit + 1).cast("double") / lit(4294967296.0)), 6) /
      col("w")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy(col("__k").desc, col("id"))
    val want = df.withColumn("__k", key)
      .withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= 9)
      .select("g", "sample_rank", "id").orderBy("g", "sample_rank")
      .collect().toSeq
    assert(got == want)
    assert(got.groupBy(_.getString(0)).forall(_._2.size == 9))
  }

  test("selection pressure follows the weights") {
    // 1000 rows, 50 with weight 200, the rest weight 1: the heavy rows
    // must dominate a 40-row sample (each heavy key is far larger in
    // expectation; seed-stable, not flaky)
    val df = (0 until 1000).map(i =>
        ("s", i.toLong, if (i % 20 == 0) 200.0 else 1.0))
      .toDF("g", "id", "w")
    val picked = Sampling.weightedSampleExactN(df, col("g"), col("id"),
        col("w"), n = 40)
      .collect().map(_.getLong(1)).toSet
    val heavy = picked.count(_ % 20 == 0)
    assert(heavy >= 30, s"only $heavy of 40 sampled rows are heavy")
  }

  test("non-positive, NaN, or NULL weights fail loudly") {
    Seq(0.0, -1.0, Double.NaN).foreach { bad =>
      val df = Seq(("g", 1L, 2.0), ("g", 2L, bad)).toDF("g", "id", "w")
      val e = intercept[Exception] {
        Sampling.weightedSampleExactN(df, col("g"), col("id"),
          col("w"), 2).collect()
      }
      assert(e.getMessage != null)
    }
    val withNull = Seq(("g", 1L, Some(2.0)), ("g", 2L, None))
      .toDF("g", "id", "w")
    val e = intercept[Exception] {
      Sampling.weightedSampleExactN(withNull, col("g"), col("id"),
        col("w"), 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("deterministic under repartitioning") {
    val df = (0 until 300).map(i => ("g", i.toLong, 1.0 + i % 7))
      .toDF("g", "id", "w")
    val a = Sampling.weightedSampleExactN(df, col("g"), col("id"),
      col("w"), 11).orderBy("sample_rank").collect().toSeq
    val b = Sampling.weightedSampleExactN(df.repartition(13, col("w")),
        col("g"), col("id"), col("w"), 11)
      .orderBy("sample_rank").collect().toSeq
    assert(a == b)
  }
}
