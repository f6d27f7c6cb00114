package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Duplicate-line repetition rules: exact fraction arithmetic, inclusive
  * keep at the paper's 0.30/0.20 removal bounds, and the degenerate
  * corners (single line, empty lines). */
class DupLineFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private def feats(text: String): org.apache.spark.sql.Row =
    Seq(Tuple1(text)).toDF("text")
      .select(TextMetrics.dupLineFeatures(col("text")).as("f"))
      .select("f.*").collect().head

  test("no repeats scores zero on both fractions and keeps") {
    val r = feats("alpha\nbeta\ngamma\ndelta")
    assert(r.getAs[Long]("n_lines") == 4L)
    assert(r.getAs[Double]("dup_line_frac") == 0.0)
    assert(r.getAs[Double]("dup_line_char_frac") == 0.0)
    assert(r.getAs[Boolean]("keep"))
  }

  test("fractions count occurrences beyond the first") {
    // "aaaa" x3 + "bb" x1: 4 lines, 2 distinct -> line frac 2/4 = 0.5;
    // chars 4*3+2 = 14, distinct chars 6 -> char frac 8/14
    val r = feats("aaaa\nbb\naaaa\naaaa")
    assert(r.getAs[Long]("n_lines") == 4L)
    assert(r.getAs[Double]("dup_line_frac") == 0.5)
    assert(math.abs(r.getAs[Double]("dup_line_char_frac") - 8.0 / 14) < 1e-6)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("keep is inclusive at 0.30 lines and 0.20 chars") {
    // 10 equal-length lines, 3 of them repeats: line frac 0.3 (boundary,
    // kept), char frac 0.3 > 0.2 (removed) -> the CHAR rule rejects
    val charHeavy = feats((Seq.fill(4)("aaaa") ++
      (1 to 6).map(i => s"lin$i")).mkString("\n"))
    assert(charHeavy.getAs[Double]("dup_line_frac") == 0.3)
    assert(charHeavy.getAs[Double]("dup_line_char_frac") == 0.3)
    assert(!charHeavy.getAs[Boolean]("keep"))
    // make the repeated line SHORT so chars stay at the 0.20 boundary:
    // 3 repeats of "ab" (6 chars) over 30 total chars = 0.2, kept
    val tail = Seq("cccccc", "dddddd", "eeee", "ff", "gg", "hh")
    val boundary = feats((Seq.fill(4)("ab") ++ tail).mkString("\n"))
    assert(boundary.getAs[Double]("dup_line_frac") == 0.3)
    assert(boundary.getAs[Double]("dup_line_char_frac") == 0.2)
    assert(boundary.getAs[Boolean]("keep"))
    // one more repeated line: 4/11 > 0.30 removes on the line rule
    val over = feats((Seq.fill(5)("ab") ++ tail).mkString("\n"))
    assert(over.getAs[Double]("dup_line_frac") > 0.30)
    assert(!over.getAs[Boolean]("keep"))
  }

  test("a single-line document cannot repeat and keeps") {
    val r = feats("the only line")
    assert(r.getAs[Long]("n_lines") == 1L)
    assert(r.getAs[Double]("dup_line_frac") == 0.0)
    assert(r.getAs[Boolean]("keep"))
  }

  test("all-empty lines: zero chars scores 0, not 0/0") {
    val r = feats("\n\n")
    assert(r.getAs[Long]("n_lines") == 3L)
    // three empty lines are repeats of one distinct empty line
    assert(math.abs(r.getAs[Double]("dup_line_frac") - 2.0 / 3) < 1e-6)
    assert(r.getAs[Double]("dup_line_char_frac") == 0.0)
  }
}
