package graft.ops

import graft.SparkSpec

/** Span-level decontamination: the planted benchmark region comes back
  * with exact token bounds, corpus-internal duplication does NOT mark
  * anything (only eval overlap does), and the layout is partitioning-
  * invariant. */
class DecontaminateSpansSpec extends SparkSpec {
  import spark.implicits._

  // a 10-token "benchmark" passage planted verbatim inside one training
  // document; k = 4 -> 7 consecutive contaminated window starts
  private val bench = "what is the capital of france the answer is paris"
  private val evalDoc = "question one " + bench + " question two follows"
  private val trainHit = "some training prose here " + bench +
    " and the document continues onward"
  private val trainClean = "uno dos tres cuatro cinco seis siete ocho " +
    "nueve diez once doce trece catorce"

  private def evalDf = Seq((1L, evalDoc)).toDF("doc_id", "text")

  test("a planted benchmark passage returns its exact span") {
    val corpus = Seq((100L, trainHit), (101L, trainClean))
      .toDF("doc_id", "text")
    val spans = Dedup.decontaminateSpans(corpus, evalDf, "doc_id", "text",
      k = 4, minSpanTokens = 4).collect()
    assert(spans.length == 1)
    val r = spans.head
    // trainHit: 4 lead tokens, then the 10 benchmark ones -> [4, 13]
    assert(r.getLong(0) == 100L)
    assert(r.getLong(1) == 4L && r.getLong(2) == 13L && r.getLong(3) == 10L)
  }

  test("corpus-internal duplication does not mark (eval overlap only)") {
    // two training docs share a passage with EACH OTHER but not with
    // the eval set: duplicatedSpans would flag them, decontamination
    // must not
    val sharedCorpus = "alpha beta gamma delta epsilon zeta"
    val corpus = Seq(
      (100L, "one two " + sharedCorpus + " three four"),
      (101L, "red blue " + sharedCorpus + " green pink"))
      .toDF("doc_id", "text")
    assert(Dedup.decontaminateSpans(corpus, evalDf, "doc_id", "text",
      k = 4, minSpanTokens = 4).collect().isEmpty)
    assert(Dedup.duplicatedSpans(corpus, "doc_id", "text",
      k = 4, minSpanTokens = 4).count() == 2)
  }

  test("overlap below k tokens is invisible; minSpanTokens floors above") {
    // only a 3-token overlap with the eval text: no 4-gram matches
    val corpus = Seq((100L, "xx yy capital of france zz ww vv"))
      .toDF("doc_id", "text")
    assert(Dedup.decontaminateSpans(corpus, evalDf, "doc_id", "text",
      k = 4, minSpanTokens = 4).collect().isEmpty)
    // the full passage matches at k=4 but a 12-token floor drops it
    val hit = Seq((100L, trainHit)).toDF("doc_id", "text")
    assert(Dedup.decontaminateSpans(hit, evalDf, "doc_id", "text",
      k = 4, minSpanTokens = 12).collect().isEmpty)
  }

  test("guards: k >= 1, minSpanTokens >= k") {
    val corpus = Seq((100L, trainHit)).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.decontaminateSpans(corpus, evalDf, "doc_id", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.decontaminateSpans(corpus, evalDf, "doc_id", "text",
        k = 8, minSpanTokens = 4)
    }
  }

  test("spans are partitioning-invariant") {
    val corpus = Seq((100L, trainHit), (101L, trainClean),
      (102L, "filler " + bench)).toDF("doc_id", "text")
    val one = Dedup.decontaminateSpans(corpus.coalesce(1), evalDf,
      "doc_id", "text", k = 4, minSpanTokens = 4)
      .orderBy("id", "span_start").collect()
    val many = Dedup.decontaminateSpans(corpus.repartition(7),
      evalDf.repartition(3), "doc_id", "text", k = 4, minSpanTokens = 4)
      .orderBy("id", "span_start").collect()
    assert(one.toSeq == many.toSeq && one.length == 2)
  }
}
