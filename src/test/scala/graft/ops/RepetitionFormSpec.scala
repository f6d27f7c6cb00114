package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bit-equality between the native RepetitionSig expression (the scale
  * path since round 8) and the retained higher-order-function oracle
  * form — the same two-form pinning the MinhashSig family uses. */
class RepetitionFormSpec extends SparkSpec {
  import spark.implicits._

  test("native RepetitionSig == HOF form, bit-identical, incl. edges") {
    val rnd = new scala.util.Random(7)
    val vocab = Seq("the", "data", "spark", "row", "scan")
    val docs: Seq[String] =
      (0 until 200).map(_ => (0 until (1 + rnd.nextInt(60)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")) ++
      Seq("", "solo", "two words", "x x x x", "a  b  c", " lead",
        "trail ", null)
    val df = docs.toDF("text")
    val expr = df.select(
      TextMetrics.repetitionFeatures(col("text")).as("f")).collect()
    val hof = df.select(
      TextMetrics.repetitionFeaturesHof(col("text")).as("f")).collect()
    expr.zip(hof).zipWithIndex.foreach { case ((ra, rb), i) =>
      assert(ra == rb, s"row $i (${docs(i)}): native $ra != hof $rb")
    }
  }

  test("n parameter respected by both forms (bigrams)") {
    val df = Seq("a b a b a").toDF("text")
    val a = df.select(TextMetrics.repetitionFeatures(col("text"), 2))
      .collect()(0)
    val b = df.select(TextMetrics.repetitionFeaturesHof(col("text"), 2))
      .collect()(0)
    assert(a == b)
    // grams: "a b","b a","a b","b a" -> 2 distinct of 4 -> 0.5
    assert(a.getStruct(0).getDouble(1) == 0.5)
  }
}
