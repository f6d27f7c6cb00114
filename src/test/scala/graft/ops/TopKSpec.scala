package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The two-phase grouped top-k: row-identical to the window form on
  * random data with ties, skew, null groups, and undersized groups;
  * bounded-buffer merge paths forced by repartitioning. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def cols(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "id", "s", "topk_rank").orderBy("g", "topk_rank")
      .collect().toSeq

  test("equals the window form: ties, skew, null group, small groups") {
    val rnd = new scala.util.Random(20260814)
    val rows = (0 until 3000).map { i =>
      // group "hot" holds ~80% of rows; scores collide often (ties)
      val g = if (rnd.nextDouble() < 0.8) "hot"
        else if (rnd.nextDouble() < 0.1) null
        else s"g${rnd.nextInt(5)}"
      (g, i.toLong, (rnd.nextInt(40) * 0.5))
    } :+ (("tiny", 99999L, 1.0)) // group smaller than k
    val df = rows.toDF("g", "id", "s").repartition(17, col("id"))
    val a = cols(TopK.topKByScore(df, col("g"), col("id"), col("s"), 7))
    val b = cols(TopK.topKByScoreWindow(df, col("g"), col("id"),
      col("s"), 7))
    assert(a == b)
    assert(a.exists(_.isNullAt(0)), "null group must rank like any other")
    assert(a.count(r => r.getString(0) == "tiny") == 1)
  }

  test("NULL and NaN scores fail loudly, naming the id") {
    val withNull = Seq(("a", 1L, Some(5.0)), ("a", 2L, None))
      .toDF("g", "id", "s")
    val e1 = intercept[Exception] {
      TopK.topKByScore(withNull, col("g"), col("id"), col("s"), 2).collect()
    }
    assert(e1.getMessage != null)
    val withNan = Seq(("a", 1L, 5.0), ("a", 2L, Double.NaN))
      .toDF("g", "id", "s")
    val e2 = intercept[Exception] {
      TopK.topKByScore(withNan, col("g"), col("id"), col("s"), 2).collect()
    }
    assert(e2.getMessage != null)
  }

  test("a NULL id fails loudly instead of silently vanishing") {
    // the window form would rank a null id; the two-phase join-back can
    // never match it (three-valued-false), so the contract is a loud
    // failure, mirroring the score guard
    val df = Seq((Some("a"), Some(1L), 5.0), (Some("a"), None, 7.0))
      .toDF("g", "id", "s")
    val e = intercept[Exception] {
      TopK.topKByScore(df, col("g"), col("id"), col("s"), 2).collect()
    }
    assert(e.getMessage != null)
  }

  test("a pre-existing topk_rank column is replaced, as withColumn does") {
    val df = Seq(("a", 1L, 5.0, 42), ("a", 2L, 7.0, 42))
      .toDF("g", "id", "s", "topk_rank")
    val r = TopK.topKByScore(df, col("g"), col("id"), col("s"), 1)
      .collect()
    assert(r.length == 1 && r(0).getLong(1) == 2L)
  }
}
