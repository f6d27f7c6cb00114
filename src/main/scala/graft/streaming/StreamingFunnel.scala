package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TextMetrics

/** Streaming curation funnel — the admission dashboard for a
  * continuously-ingesting corpus: per quality RULE, the running count
  * of documents that fail it (and the running total), refreshed every
  * micro-batch. The streaming twin of the batch `quality_funnel` row,
  * built on the SAME single-sourced predicates
  * ([[TextMetrics.gopherRules]] + the repetition rule), so the
  * streaming dashboard and the batch filter cannot disagree about what
  * a rule means.
  *
  * Shape: all rules evaluate ROW-LOCALLY (codegen'd projections riding
  * the stream), explode to (rule, fail) observations, then ONE
  * streaming aggregation keyed by rule name (Update mode) — state is
  * |rules| rows of two counters, bounded forever; sums are
  * order-insensitive, so replays/batch boundaries cannot change a
  * total. */
object StreamingFunnel {

  /** Running (rule, n_fail, n_docs) per micro-batch. */
  def funnel(stream: DataFrame, text: Column, minWords: Int = 50,
             maxWords: Int = 100000,
             stopwords: Seq[String] = TextMetrics.GopherStopwords,
             ngramMax: Double = 0.3): DataFrame = {
    val g = TextMetrics.gopherFlags(text, minWords, maxWords, stopwords)
    val r = TextMetrics.repetitionFeatures(text)
    val withFeat = stream.select(g.as("g"), r.as("r"))
    val rules = TextMetrics.gopherRules(
      col("g.n_words"), col("g.mean_word_len"), col("g.hash_ratio"),
      col("g.ellipsis_ratio"), col("g.alpha_frac"),
      col("g.n_stopwords"), col("g.bullet_frac"),
      col("g.ellipsis_frac"), minWords, maxWords) :+
      ("repetition" -> (col("r.dup_ngram_frac") < ngramMax))
    val all = "all_rules" -> rules.map(_._2).reduce(_ && _)
    val obs = (rules :+ all).map { case (n, c) =>
      struct(lit(n).as("rule"),
        when(c, lit(0L)).otherwise(lit(1L)).as("fail"))
    }
    withFeat
      .select(explode(array(obs: _*)).as("o"))
      .select(col("o.*"))
      .groupBy(col("rule"))
      .agg(sum(col("fail")).as("n_fail"), count(lit(1)).as("n_docs"))
  }
}
