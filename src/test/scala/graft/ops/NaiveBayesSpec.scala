package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multinomial Naive Bayes: hand-computed model numbers and scores on
  * a tiny corpus, the sparse-decomposition identity against a dense
  * reference scorer, OOV dropping, loud NULL-label rejection, and the
  * admission-rule composition (NB "keep" as a curation filter). */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "spam spam buy", "bad"),
    (1L, "buy now", "bad"),
    (2L, "hello world report", "good"),
    (3L, "world report today now", "good")).toDF("doc_id", "text", "label")

  test("model numbers match hand arithmetic (Laplace, 6-dp logs)") {
    val m = NaiveBayes.train(docs, "text", "label")
    assert(m.vocabSize == 7L) // spam buy now hello world report today
    val cs = m.classStats.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // bad: 2 docs, 5 tokens; good: 2 docs, 7 tokens; priors ln(0.5)
    assert(cs("bad") == ((2L, 5L, math.rint(math.log(0.5) * 1e6) / 1e6,
      math.rint(math.log(12.0) * 1e6) / 1e6)))
    assert(cs("good")._2 == 7L)
    val tcs = m.tokenCounts.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tcs(("spam", "bad")) == 2L && tcs(("now", "good")) == 1L)
    assert(!tcs.contains(("spam", "good"))) // sparse: zeros absent
  }

  test("sparse decomposition equals the dense reference scorer") {
    val m = NaiveBayes.train(docs, "text", "label")
    val got = NaiveBayes.scoreAll(docs, "doc_id", "text", m).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    // dense reference on the driver: identical rounding discipline
    val tcs = m.tokenCounts.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      .withDefaultValue(0L)
    val cs = m.classStats.collect().map(r => r.getString(0) ->
      ((r.getDouble(3), r.getDouble(4)))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val corpus = docs.collect().map(r =>
      (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    for ((id, toks) <- corpus; (label, (prior, norm)) <- cs) {
      val s = BigDecimal(toks.map(t => r6(math.log(tcs((t, label)) + 1)))
        .map(BigDecimal(_)).sum.toString).toDouble
      val want = r6(prior - toks.length * norm + s)
      assert(got((id, label)) == want,
        s"doc $id class $label: ${got((id, label))} != $want")
    }
  }

  test("argmax predicts the training classes on separable data; OOV " +
      "tokens are dropped at scoring") {
    val m = NaiveBayes.train(docs, "text", "label")
    val pred = NaiveBayes.predict(docs, "doc_id", "text", m).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(0L -> "bad", 1L -> "bad", 2L -> "good",
      3L -> "good"))
    // a doc of one known token + OOV junk scores as the known token
    val fresh = Seq((9L, "spam zzz qqq")).toDF("doc_id", "text")
    val p = NaiveBayes.predict(fresh, "doc_id", "text", m).collect().head
    assert(p.getString(1) == "bad")
    // N_d counted in-vocab only: scores equal those of "spam" alone
    val alone = NaiveBayes.scoreAll(Seq((9L, "spam")).toDF("doc_id", "text"),
      "doc_id", "text", m).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    val mixed = NaiveBayes.scoreAll(fresh, "doc_id", "text", m).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(alone == mixed)
  }

  test("a document with ZERO in-vocabulary tokens scores its prior " +
      "alone and is EMITTED, never silently dropped") {
    val m = NaiveBayes.train(docs, "text", "label")
    val oovDoc = Seq((7L, "zzz qqq unknownwords")).toDF("doc_id", "text")
    val scores = NaiveBayes.scoreAll(oovDoc, "doc_id", "text", m)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    // N_d = 0: score = log_prior exactly (both classes ln 0.5 here)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(scores == Map("bad" -> r6(math.log(0.5)),
      "good" -> r6(math.log(0.5))), s"got $scores")
    val p = NaiveBayes.predict(oovDoc, "doc_id", "text", m).collect()
    assert(p.length == 1 && p.head.getString(1) == "bad") // label tie-break
  }

  test("NULL labels fail loudly at training") {
    val bad = Seq((0L, "a b", "x"), (1L, "c d", null))
      .toDF("doc_id", "text", "label")
    val e = intercept[Exception] {
      NaiveBayes.train(bad, "text", "label").classStats.collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("NULL label")))
  }

  test("duplicate ids fail loudly at scoring (a duplicated id would " +
      "blend two documents into one shipped score)") {
    val train = Seq((0L, "a b", "x"), (1L, "c d", "y"))
      .toDF("doc_id", "text", "label")
    val m = NaiveBayes.train(train, "text", "label")
    val dup = Seq((7L, "a b"), (7L, "c d"), (8L, "a d"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      NaiveBayes.scoreAll(dup, "doc_id", "text", m).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("duplicate id")), s"got ${msgs(e)}")
  }

  test("composed as a curation admission rule: NB keep-filter over the " +
      "rule-passing set, weak labels from the rules themselves") {
    // weak-supervision loop exactly as the curation stack runs it:
    // rule-label a corpus, train, then admit on predicted 'keep'
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog and then some"),
      (1L, "the pipeline reads parquet and writes curated shards daily"),
      (2L, "buy buy buy buy buy"),
      (3L, "zz zz zz zz zz"),
      (4L, "the quick brown fox reads parquet shards daily and jumps"))
      .toDF("doc_id", "text")
    val label = when(col("text").contains("the"), lit("keep"))
      .otherwise(lit("drop"))
    val m = NaiveBayes.train(corpus.withColumn("label", label),
      "text", "label")
    val admitted = corpus
      .join(NaiveBayes.predict(corpus, "doc_id", "text", m)
        .where(col("predicted") === "keep").select(col("doc_id")),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(admitted == Set(0L, 1L, 4L))
  }
}
