package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{MinhashSig, SimhashSig, WinnowSig}
import graft.ops.{Dedup, TextMetrics}
import org.apache.spark.sql.graftshim.Internals.{column => toCol, expression => toExpr}

/** Per-token marginal cost of the interpreted text operators (VERDICT r7
  * "Next #3"): `repetitionFeatures`, `chunks`, `shingles` run on Spark's
  * INTERPRETED higher-order-function path (array lambdas have no
  * codegen), and the fingerprint expressions (`MinhashSig`/`SimhashSig`/
  * `WinnowSig`) are CodegenFallback — all per-row scalar work whose cost
  * the round-7 verdict wanted measured in ns/token before deciding
  * whether any deserves promotion to a `doGenCode` expression.
  *
  * Method: synthetic corpora at three doc lengths (50/500/5000 tokens)
  * with the TOTAL token count held constant (~2M tokens), so a flat
  * ns/token across lengths means cost is linear in tokens (per-doc
  * overhead amortized), and any super-linear term (the repetition
  * sort, winnowing's window scan) shows as rising ns/token. Ops are
  * interleaved within each length; two timed iterations per op, second
  * reported (codegen/JIT warm). Forcing is a checksum aggregate over
  * every output field so projection pruning cannot skip work.
  *
  *   sbt "runMain graft.tools.TextHotBench [totalTokens]"
  */
object TextHotBench {

  def main(args: Array[String]): Unit = {
    val totalTokens = if (args.length > 0) args(0).toLong else 2000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def corpus(docTokens: Int): DataFrame = {
      val nDocs = (totalTokens / docTokens).toInt
      val vocab = graft.tools.ScaleGen.Vocab
      val id = col("id")
      // deterministic word soup, built once and checkpointed so the
      // generator's own cost never rides a timed leg
      val toks = transform(sequence(lit(0), lit(docTokens - 1)),
        i => element_at(typedLit(vocab),
          pmod(xxhash64(id, i), lit(vocab.size.toLong)).cast("int") + 1))
      spark.range(nDocs)
        .select(id.as("doc_id"), concat_ws(" ", toks).as("text"))
        .repartition(32).localCheckpoint(true)
    }

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val chk = f
      ((System.nanoTime() - t0) / 1e9, chk)
    }

    def ops(df: DataFrame): Seq[(String, () => Long)] = Seq(
      "repetition_hof" -> (() =>
        df.select(TextMetrics.repetitionFeaturesHof(col("text")).as("f"))
          .agg(sum(col("f.dup_token_frac") + col("f.dup_ngram_frac") +
            col("f.top_token_frac")).cast("long")).as[Long].collect()(0)),
      "repetition_sig" -> (() =>
        df.select(TextMetrics.repetitionFeatures(col("text")).as("f"))
          .agg(sum(col("f.dup_token_frac") + col("f.dup_ngram_frac") +
            col("f.top_token_frac")).cast("long")).as[Long].collect()(0)),
      "chunks" -> (() =>
        df.select(explode(TextMetrics.chunks(col("text"), 64, 8)).as("c"))
          .agg(sum(length(col("c.chunk_text"))).cast("long"))
          .as[Long].collect()(0)),
      "shingles" -> (() =>
        df.select(explode(Dedup.shingles(col("text"))).as("s"))
          .agg(count(lit(1))).as[Long].collect()(0)),
      "minhash_sig" -> (() =>
        df.select(toCol(MinhashSig(toExpr(col("text")), 3, 32)).as("sig"))
          .agg(expr("bit_xor(sig[0] ^ sig[31])")).as[Long].collect()(0)),
      "simhash_sig" -> (() =>
        df.select(toCol(SimhashSig(toExpr(col("text")), 3)).as("sig"))
          .agg(expr("bit_xor(sig)")).as[Long].collect()(0)),
      "winnow_sig" -> (() =>
        df.select(toCol(WinnowSig(toExpr(col("text")), 5, 4)).as("sig"))
          .agg(sum(size(col("sig")))).as[Long].collect()(0)))

    Seq(50, 500, 5000).foreach { len =>
      val df = corpus(len)
      val n = df.count()
      println(f"[texthot] === $len%5d tokens/doc x $n%7d docs ===")
      ops(df).foreach { case (name, f) =>
        time(f()) // warm
        val (sec, chk) = time(f())
        val nsTok = sec * 1e9 / totalTokens
        println(f"[texthot] $len%5d tok/doc  $name%-12s $sec%7.2f s" +
          f"  $nsTok%8.1f ns/token  (chk=$chk)")
      }
      df.unpersist()
    }
    spark.stop()
  }
}
