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

  test("symbol ratio counts # and ellipsis per word") {
    val r = flags("the cat ... sat # with # dots ...")
    // 9 words (the two ... and two # are words), 2 '#' + 2 '...' = 4/9
    assert(r.getAs[Double]("symbol_ratio") > 0.1)
    assert(!r.getAs[Boolean]("keep"))
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

  test("bullet and ellipsis line rules fire on raw newlines") {
    // 9 of 10 lines bulleted: 0.9 is NOT < 0.9, so the rule rejects
    val bullets = (1 to 9).map(i => s"- item number $i with the").mkString("\n")
    val rb = flags(bullets + "\nthe one plain line with text")
    assert(rb.getAs[Double]("bullet_frac") == 0.9)
    assert(!rb.getAs[Boolean]("keep"))
    // 8 of 10: 0.8 < 0.9 passes the LINE rule (keep still depends on the
    // word rules, which the "-" and digit tokens fail — assert the flag,
    // not the conjunction)
    val rb2 = flags(bullets.split("\n").take(8).mkString("\n") +
      "\nthe plain line with text\nthe other plain line here")
    assert(rb2.getAs[Double]("bullet_frac") == 0.8)
    val re = flags("the first line trails off...\nthe second also does...\n" +
      "a plain line with words")
    assert(math.abs(re.getAs[Double]("ellipsis_frac") - 0.666667) < 1e-6)
    assert(!re.getAs[Boolean]("keep"))
  }
}
