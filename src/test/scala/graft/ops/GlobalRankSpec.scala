package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Two-phase exact global rank + epoch shuffle: permutation exactness,
  * equivalence with the single-partition global-window reference across
  * bucket widths, per-epoch permutation independence, partitioning
  * invariance, and the loud tie/NULL guards. */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    // keys spread over the full signed-64 range, like a hash key
    (0 until n).map(i => (i.toLong, rnd.nextLong())).toDF("id", "k")
  }

  private def reference(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.withColumn("r", row_number().over(
        Window.orderBy(col("k"), col("id"))).cast("long"))
      .select("id", "r").as[(Long, Long)].collect().toSeq.sortBy(_._1)

  test("equals the global-window reference across bucket widths") {
    val df = corpus(20260815, 700).repartition(13, col("id"))
    val want = reference(df)
    for (bits <- Seq(1, 4, 12, 20)) {
      val got = Layout.globalRank(df, col("id"), col("k"), bits)
        .select("id", "global_rank").as[(Long, Long)]
        .collect().toSeq.sortBy(_._1)
      assert(got == want, s"bucketBits=$bits diverged")
    }
  }

  test("ranks are an exact 1..n permutation") {
    val df = corpus(7, 500)
    val ranks = Layout.globalRank(df, col("id"), col("k"))
      .select("global_rank").as[Long].collect().toSeq.sorted
    assert(ranks == (1L to 500L))
  }

  test("epoch shuffle: reproducible within an epoch, distinct across") {
    val docs = (0L until 300L).map(i => (i, s"doc$i")).toDF("id", "text")
    def pos(epoch: Int, parts: Int): Seq[(Long, Long)] =
      Layout.epochShuffle(docs.repartition(parts, col("id")),
          col("id"), epoch)
        .select("id", "train_pos").as[(Long, Long)]
        .collect().toSeq.sortBy(_._1)
    val e1a = pos(1, 3); val e1b = pos(1, 19); val e2 = pos(2, 3)
    assert(e1a == e1b, "same epoch is partitioning-invariant")
    assert(e1a != e2, "different epochs permute differently")
    assert(e2.map(_._2).sorted == (1L to 300L), "still a permutation")
  }

  test("duplicate (key, id) pairs fail loudly") {
    val dup = Seq((1L, 10L), (2L, 20L), (2L, 20L)).toDF("id", "k")
    val e = intercept[Exception] {
      Layout.globalRank(dup, col("id"), col("k"))
        .select("global_rank").collect()
    }
    assert(e.getMessage != null)
  }

  test("NULL key fails loudly naming the id") {
    val df = Seq((1L, Some(5L)), (7L, None)).toDF("id", "k")
    val e = intercept[Exception] {
      Layout.globalRank(df, col("id"), col("k"))
        .select("global_rank").collect()
    }
    assert(e.getMessage != null)
  }

  test("bucketBits outside [1, 20] is rejected") {
    val df = corpus(1, 10)
    intercept[IllegalArgumentException] {
      Layout.globalRank(df, col("id"), col("k"), bucketBits = 0) }
    intercept[IllegalArgumentException] {
      Layout.globalRank(df, col("id"), col("k"), bucketBits = 21) }
  }
}
