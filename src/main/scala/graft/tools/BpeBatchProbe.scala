package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ops.Bpe

/** Measurement instrument for the batched-disjoint BPE trainer
  * (SCALE_r12): (a) the gated-row shape — merges=12, batchN=4 — with
  * per-round pick counts (tells the oracle author how many rounds to
  * unroll); (b) the iteration-collapse measurement the batched form
  * exists for: `merges` total merges, sequential vs batched@batchN,
  * wall-clocked, with the round count reported.
  *
  * A `synth:<nWords>` sfDir generates a deterministic Zipf-ish corpus
  * with a PRODUCTION-SIZED vocabulary instead of reading parquet — the
  * sf documents tables share one small vocabulary register and exhaust
  * at ~90 merges, which cannot exercise the deep-merge regime the
  * batched trainer exists for (30k-merge tokenizers). Words are the
  * base-36 renderings of 1..n (alphabet 36, length ~3-5), frequency
  * n/i — enough pair diversity to sustain 1000+ merges.
  *
  *   sbt "runMain graft.tools.BpeBatchProbe [sfDir|synth:N] [merges] [batchN] [seqMerges]"
  */
object BpeBatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val merges = if (args.length > 1) args(1).toInt else 256
    val batchN = if (args.length > 2) args(2).toInt else 32
    val seqMerges = if (args.length > 3) args(3).toInt else merges
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val docs =
      if (sfDir.startsWith("synth:")) {
        val n = sfDir.drop("synth:".length).toLong
        spark.range(1, n + 1)
          .select(expr(s"repeat(concat(lower(conv(id, 10, 36)), ' '), " +
            s"greatest(1, cast($n / id as int)))").as("text"))
          .localCheckpoint(true) // pin: both trainers scan it repeatedly
      } else spark.read.parquet(s"$sfDir/documents.parquet")

    // (a) the gated-row shape: rounds + per-round picks
    val (small, _) = Bpe.trainBatched(docs, "text", 12, 4)
    val byRound = small.groupBy(_.round_no).toSeq.sortBy(_._1)
      .map { case (r, ms) => s"r$r=${ms.size}" }.mkString(" ")
    println(s"BPEBATCH gated-shape merges=12 batchN=4 " +
      s"rounds=${small.map(_.round_no).max} picks: $byRound")
    small.foreach(m => println(
      s"BPEBATCH   step=${m.step} round=${m.round_no} " +
        s"(${m.lhs},${m.rhs}) cnt=${m.pair_count}"))

    // (b) iteration collapse: sequential at seqMerges (its per-merge
    // cost is flat, so a shorter run prices the deep regime honestly),
    // batched at the full depth
    val t0 = System.nanoTime()
    val (seq, _) = Bpe.train(docs, "text", seqMerges)
    val seqSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val (bat, _) = Bpe.trainBatched(docs, "text", merges, batchN)
    val batSec = (System.nanoTime() - t1) / 1e9
    val rounds = if (bat.isEmpty) 0 else bat.map(_.round_no).max
    val agree = seq.map(m => (m.lhs, m.rhs)).toSet
      .intersect(bat.map(m => (m.lhs, m.rhs)).toSet).size
    println(f"BPEBATCH sequential merges=${seq.size} wall=$seqSec%.1f s" +
      f"  (${seqSec / math.max(seq.size, 1)}%.3f s/merge)")
    println(f"BPEBATCH batched    merges=${bat.size} batchN=$batchN " +
      f"rounds=$rounds wall=$batSec%.1f s" +
      f"  (${batSec / math.max(rounds, 1)}%.3f s/round)  " +
      f"table-overlap=$agree/${seq.size}")
    spark.stop()
  }
}
