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

  /** The funnel's rule set over a `g`/`r` feature-struct pair — the
    * single Spark-side source shared by [[funnel]] and the composed
    * [[StreamingCuration]] admission, so the dashboard and the
    * admission filter cannot disagree about what a rule means. The
    * final "all_rules" entry is the admission conjunction. */
  def rulesOver(g: Column, r: Column, minWords: Int, maxWords: Int,
                ngramMax: Double): Seq[(String, Column)] = {
    val rules = TextMetrics.gopherRules(
      g.getField("n_words"), g.getField("mean_word_len"),
      g.getField("hash_ratio"), g.getField("ellipsis_ratio"),
      g.getField("alpha_frac"), g.getField("n_stopwords"),
      g.getField("bullet_frac"), g.getField("ellipsis_frac"),
      minWords, maxWords) :+
      ("repetition" -> (r.getField("dup_ngram_frac") < ngramMax))
    rules :+ ("all_rules" -> rules.map(_._2).reduce(_ && _))
  }

  /** The input extended with the bound feature structs `__qf_g` /
    * `__qf_r` — ONE projection evaluates gopherFlags/repetitionFeatures
    * per row; rule columns from [[rulesOver]] then read fields of the
    * bound structs instead of re-evaluating the feature expressions per
    * rule. */
  def withFeatures(df: DataFrame, text: Column, minWords: Int,
                   maxWords: Int, stopwords: Seq[String]): DataFrame =
    df.withColumn("__qf_g",
        TextMetrics.gopherFlags(text, minWords, maxWords, stopwords))
      .withColumn("__qf_r", TextMetrics.repetitionFeatures(text))

  /** The counting block over an already-[[withFeatures]]-extended
    * frame: per rule, (rule, n_fail, n_docs). Shared by [[funnel]] and
    * [[StreamingCuration]]'s persisted per-batch increments — one
    * counting semantics, not two copies that can drift apart while a
    * parity spec asserts their outputs equal. */
  def failCounters(featured: DataFrame, minWords: Int, maxWords: Int,
                   ngramMax: Double): DataFrame = {
    val obs = rulesOver(col("__qf_g"), col("__qf_r"), minWords, maxWords,
      ngramMax).map { case (n, c) =>
      struct(lit(n).as("rule"),
        when(c, lit(0L)).otherwise(lit(1L)).as("fail"))
    }
    featured
      .select(explode(array(obs: _*)).as("o"))
      .select(col("o.*"))
      .groupBy(col("rule"))
      .agg(sum(col("fail")).as("n_fail"), count(lit(1)).as("n_docs"))
  }

  /** Running (rule, n_fail, n_docs) per micro-batch. */
  def funnel(stream: DataFrame, text: Column, minWords: Int = 50,
             maxWords: Int = 100000,
             stopwords: Seq[String] = TextMetrics.GopherStopwords,
             ngramMax: Double = 0.3): DataFrame =
    failCounters(withFeatures(stream, text, minWords, maxWords, stopwords),
      minWords, maxWords, ngramMax)
}
