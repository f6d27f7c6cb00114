package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Gopher-rules quality filter: each rule flips on its own documented
  * boundary, the keep decision is the conjunction, and the line rules
  * see raw newlines. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def flags(text: String, minWords: Int = 5,
                    maxWords: Int = 1000): org.apache.spark.sql.Row =
    Seq(Tuple1(text)).toDF("text")
      .select(TextMetrics.gopherFlags(col("text"), minWords, maxWords)
        .as("g"))
      .select("g.*").collect().head

  // passes every rule at minWords = 5: 8 words, mean len in [3,10],
  // no symbols, all alphabetic, two stopwords ("the", "with")
  private val good = "the quick brown foxes jumped with great vigor"

  test("a clean document passes every rule") {
    val r = flags(good)
    assert(r.getAs[Boolean]("keep"))
    assert(r.getAs[Long]("n_words") == 8L)
    assert(r.getAs[Long]("n_stopwords") == 2L)
    assert(r.getAs[Double]("alpha_frac") == 1.0)
  }

  test("word-count bounds flip keep on both ends") {
    assert(!flags("the dog sat with", minWords = 5).getAs[Boolean]("keep"))
    assert(!flags(good, minWords = 5, maxWords = 7).getAs[Boolean]("keep"))
  }

  test("mean word length outside [3, 10] rejects") {
    val short = flags("ab cd ef gh ij kl mn op")
    assert(short.getAs[Double]("mean_word_len") == 2.0)
    assert(!short.getAs[Boolean]("keep"))
    val long = flags("extraordinarily incomprehensible " +
      "internationalization characteristically antidisestablishment")
    assert(long.getAs[Double]("mean_word_len") > 10.0)
    assert(!long.getAs[Boolean]("keep"))
  }

  test("# and ellipsis ratios are independent rules, not a sum") {
    val r = flags("the cat ... sat # with # dots ...")
    // 9 words, 2 '#' and 2 '...' — each ratio alone is 2/9 > 0.1
    assert(r.getAs[Double]("hash_ratio") > 0.1)
    assert(r.getAs[Double]("ellipsis_ratio") > 0.1)
    assert(!r.getAs[Boolean]("keep"))
    // the paper removes when EITHER symbol ALONE exceeds 0.1: one '#'
    // and one '...' in 20 words is 0.05 each (keep), even though the
    // old summed form would have scored 0.1 and sat on the edge
    val ok = flags("the quick brown foxes jumped with # great vigor " +
      "over the lazy sleeping dogs ... while the birds sang loudly")
    assert(ok.getAs[Double]("hash_ratio") === 0.05)
    assert(ok.getAs[Double]("ellipsis_ratio") === 0.05)
    assert(ok.getAs[Boolean]("keep"))
  }

  test("word rules tokenize across newlines (multi-line prose)") {
    // "sat\nthe" must be TWO words, and the line-start stopword counts
    val r = flags("the quick cat sat\nthe lazy dog ran")
    assert(r.getAs[Long]("n_words") == 8L)
    assert(r.getAs[Long]("n_stopwords") == 1L) // "the" (deduped)
    assert(r.getAs[Double]("alpha_frac") == 1.0)
    // mean word length must not count the newline character:
    // 27 letters / 8 words
    assert(r.getAs[Double]("mean_word_len") == 3.375)
  }

  test("alphabetic-word fraction below 0.8 rejects") {
    val r = flags("the 11 22 33 44 55 66 with 99 00")
    assert(r.getAs[Double]("alpha_frac") == 0.2)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("fewer than two stopwords rejects") {
    val r = flags("quick brown foxes jumped over lazy dogs quietly")
    assert(r.getAs[Long]("n_stopwords") == 0L)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("stopwords are matched as whole words, not substrings") {
    // "theory" contains "the", "andes" contains "and" — neither counts
    val r = flags("theory andes offset bethink weather brighter quick fox")
    assert(r.getAs[Long]("n_stopwords") == 0L)
  }

  test("bullet and ellipsis line rules fire on raw newlines, removal " +
    "strictly past the paper's bound") {
    // all-alphabetic bulleted lines so every word rule passes and the
    // conjunction isolates the LINE rule
    val line = "- the quick brown foxes jumped with great vigor"
    // 9 of 10 lines bulleted: 0.9 is the paper's boundary ("more than
    // 90%" removes) — KEPT
    val rb = flags((1 to 9).map(_ => line).mkString("\n") +
      "\nthe one plain line with text here")
    assert(rb.getAs[Double]("bullet_frac") == 0.9)
    assert(rb.getAs[Boolean]("keep"))
    // 10 of 10: 1.0 > 0.9 removes
    val rb2 = flags((1 to 10).map(_ => line).mkString("\n"))
    assert(rb2.getAs[Double]("bullet_frac") == 1.0)
    assert(!rb2.getAs[Boolean]("keep"))
    // ellipsis lines: 3 of 10 (0.3, the boundary) keeps, 4 of 10 removes
    val plain = "the quick brown foxes jumped with great vigor"
    def dotted(k: Int) = ((1 to k).map(_ => plain + " off...") ++
      (1 to (10 - k)).map(_ => plain)).mkString("\n")
    val re3 = flags(dotted(3))
    assert(re3.getAs[Double]("ellipsis_frac") == 0.3)
    assert(re3.getAs[Boolean]("keep"))
    val re4 = flags(dotted(4))
    assert(re4.getAs[Double]("ellipsis_frac") == 0.4)
    assert(!re4.getAs[Boolean]("keep"))
  }
}
