package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Two-phase token-budget selection: row-identical to the one-window
  * global-cumsum reference across bucket counts and partitionings,
  * boundary semantics (the crossing document is kept), the keep-all
  * case, and the loud priority/token guards. */
class TokenBudgetSpec extends SparkSpec {
  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame,
                        budget: Long): Seq[Long] = {
    val w = Window.orderBy(col("pri").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("bef", coalesce(sum(col("tok")).over(w), lit(0L)))
      .where(col("bef") < budget)
      .select("id").as[Long].collect().toSeq.sorted
  }

  private def sample(df: org.apache.spark.sql.DataFrame, budget: Long,
                     buckets: Int): Seq[Long] =
    Sampling.tokenBudgetSample(df, col("id"), col("pri"), col("tok"),
        budget, buckets)
      .select("id").as[Long].collect().toSeq.sorted

  private def corpus(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
        (i.toLong, rnd.nextInt(1000) / 1000.0, 1L + rnd.nextInt(40)))
      .toDF("id", "pri", "tok")
  }

  test("equals the global-window reference across bucket counts") {
    val df = corpus(20260814, 800).repartition(13, col("id"))
    val want = reference(df, budget = 4000L)
    assert(want.nonEmpty && want.size < 800, "budget must bite")
    for (b <- Seq(1, 4, 64, 1024))
      assert(sample(df, 4000L, b) == want, s"buckets=$b diverged")
  }

  test("partitioning invariance") {
    val base = corpus(7, 500)
    val a = sample(base.repartition(3, col("id")), 2500L, 16)
    val b = sample(base.repartition(29, col("pri")), 2500L, 16)
    assert(a == b && a.nonEmpty)
  }

  test("the document crossing the budget is kept; the next one is not") {
    // priorities strictly descending with id: selection order is id order
    val df = Seq((1L, 0.9, 10L), (2L, 0.8, 10L), (3L, 0.7, 10L),
      (4L, 0.6, 10L)).toDF("id", "pri", "tok")
    // budget 25: ids 1,2 fill 20 (< 25), id 3 CROSSES (before=20 < 25,
    // lands at 30), id 4 has before=30 >= 25 — out
    assert(sample(df, 25L, 8) == Seq(1L, 2L, 3L))
    // exact fit: before of id 3 == budget 20 — strictly-preceding rule
    assert(sample(df, 20L, 8) == Seq(1L, 2L))
  }

  test("budget >= corpus total keeps every row") {
    val df = corpus(11, 120)
    val total = df.agg(sum(col("tok"))).as[Long].head()
    assert(sample(df, total, 32).size == 120)
    assert(sample(df, total + 1000, 32).size == 120)
  }

  test("priority outside [0,1], NULL, or NaN fails loudly naming the id") {
    for (bad <- Seq(1.5, -0.1, Double.NaN)) {
      val df = Seq((1L, 0.5, 10L), (7L, bad, 10L)).toDF("id", "pri", "tok")
      val e = intercept[Exception] { sample(df, 100L, 8) }
      assert(e.getMessage != null)
    }
    val withNull = Seq((1L, Some(0.5), 10L), (7L, None, 10L))
      .toDF("id", "pri", "tok")
    intercept[Exception] { sample(withNull, 100L, 8) }
  }

  test("non-positive token count fails loudly") {
    val df = Seq((1L, 0.5, 10L), (9L, 0.4, 0L)).toDF("id", "pri", "tok")
    val e = intercept[Exception] { sample(df, 100L, 8) }
    assert(e.getMessage != null)
  }

  // ---- stratified (per-stratum budgets) variant --------------------------

  private def stratCorpus(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (Seq("en", "de", "zh")(rnd.nextInt(3)), i.toLong,
        rnd.nextInt(1000) / 1000.0, 1L + rnd.nextInt(40))
    }.toDF("lang", "id", "pri", "tok")
  }

  test("stratified == independent per-stratum budget walks") {
    val df = stratCorpus(20260814, 900).repartition(13, col("id"))
    val budgets = Seq("en" -> 1200L, "de" -> 400L, "zh" -> 99999L)
    val got = Sampling.tokenBudgetSampleByStratum(df, col("lang"),
        col("id"), col("pri"), col("tok"), budgets, buckets = 16)
      .select("lang", "id").as[(String, Long)].collect().toSeq.sorted
    val want = budgets.flatMap { case (lang, b) =>
      Sampling.tokenBudgetSample(df.where(col("lang") === lang),
          col("id"), col("pri"), col("tok"), b, buckets = 16)
        .select("lang", "id").as[(String, Long)].collect().toSeq
    }.sorted
    assert(got == want && got.nonEmpty)
    // en/de budgets bite (partial selection); zh's swallows its stratum
    val perLang = got.groupBy(_._1).view.mapValues(_.size).toMap
    val full = df.groupBy(col("lang")).count().as[(String, Long)]
      .collect().toMap
    assert(perLang("en") < full("en") && perLang("de") < full("de"))
    assert(perLang("zh") == full("zh"))
  }

  test("stratified: strata without a budget (and NULL strata) are excluded") {
    val df = Seq((Some("en"), 1L, 0.5, 10L), (Some("xx"), 2L, 0.5, 10L),
      (None, 3L, 0.5, 10L)).toDF("lang", "id", "pri", "tok")
    val got = Sampling.tokenBudgetSampleByStratum(df, col("lang"),
        col("id"), col("pri"), col("tok"), Seq("en" -> 100L))
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("stratified: duplicate or non-positive budgets are rejected") {
    val df = stratCorpus(3, 10)
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSampleByStratum(df, col("lang"), col("id"),
        col("pri"), col("tok"), Seq("en" -> 10L, "en" -> 20L)) }
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSampleByStratum(df, col("lang"), col("id"),
        col("pri"), col("tok"), Seq("en" -> 0L)) }
  }
}
