package graft.ops

import graft.SparkSpec

/** Duplicated-substring span detection (the ExactSubstr approximation):
  * planted cross-document spans come back merged and maximal, self-
  * repetition does not mark a document, and the layout is partitioning-
  * invariant. */
class DuplicatedSpansSpec extends SparkSpec {
  import spark.implicits._

  private def words(s: String): Int = s.split(" ").length

  // 12 shared tokens planted in the middle of two otherwise-unrelated
  // documents; k = 4 so the span is 9 consecutive duplicated windows
  private val shared = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu"
  private val docA = "one two three four five " + shared +
    " six seven eight nine ten"
  private val docB = "red orange yellow green blue " + shared +
    " indigo violet pink brown black"
  private val docC = "uno dos tres cuatro cinco seis siete ocho nueve " +
    "diez once doce trece catorce quince"

  test("a planted cross-document span merges into one maximal row") {
    val df = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(df, "doc_id", "text",
        k = 4, minSpanTokens = 4)
      .orderBy("id", "span_start").collect()
    assert(spans.length == 2)
    val a = spans.find(_.getLong(0) == 1L).get
    // docA: 5 lead tokens, then the 12 shared ones -> starts 5..13,
    // one island, span [5, 16], 12 tokens
    assert(a.getLong(1) == 5L && a.getLong(2) == 16L && a.getLong(3) == 12L)
    val b = spans.find(_.getLong(0) == 2L).get
    assert(b.getLong(1) == 5L && b.getLong(2) == 16L && b.getLong(3) == 12L)
  }

  test("minSpanTokens drops short incidental matches") {
    // only a 4-token overlap: below a 6-token floor it vanishes
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "z y x w e f g h q r")).toDF("doc_id", "text")
    val all = Dedup.duplicatedSpans(df, "doc_id", "text",
      k = 4, minSpanTokens = 4).collect()
    assert(all.length == 2 && all.forall(_.getLong(3) == 4L))
    val floored = Dedup.duplicatedSpans(df, "doc_id", "text",
      k = 4, minSpanTokens = 6).collect()
    assert(floored.isEmpty)
  }

  test("self-repetition inside one document does not mark it") {
    // the same 4-gram appears twice in doc 1 but in no other document
    val df = Seq(
      (1L, "p q r s xx p q r s yy"),
      (2L, docC)).toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(df, "doc_id", "text",
      k = 4, minSpanTokens = 4).collect().isEmpty)
  }

  test("two disjoint shared regions stay two spans") {
    val s1 = "alpha beta gamma delta"
    val s2 = "omega psi chi phi"
    val df = Seq(
      (1L, s1 + " filler1 filler2 filler3 " + s2),
      (2L, s1 + " unrelated tokens here padding " + s2))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(df, "doc_id", "text",
        k = 4, minSpanTokens = 4)
      .where($"id" === 1L).orderBy("span_start").collect()
    assert(spans.length == 2)
    assert(spans(0).getLong(1) == 0L && spans(0).getLong(3) == 4L)
    assert(spans(1).getLong(1) == words(s1) + 3 && spans(1).getLong(3) == 4L)
  }

  test("guards: k >= 1, minSpanTokens >= k") {
    val df = Seq((1L, docA)).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.duplicatedSpans(df, "doc_id", "text", k = 0)
    }
    intercept[IllegalArgumentException] {
      Dedup.duplicatedSpans(df, "doc_id", "text", k = 8, minSpanTokens = 4)
    }
  }

  test("spans are partitioning-invariant") {
    val df = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val one = Dedup.duplicatedSpans(df.coalesce(1), "doc_id", "text",
      k = 4, minSpanTokens = 4).orderBy("id", "span_start").collect()
    val many = Dedup.duplicatedSpans(df.repartition(7), "doc_id", "text",
      k = 4, minSpanTokens = 4).orderBy("id", "span_start").collect()
    assert(one.toSeq == many.toSeq)
  }
}
