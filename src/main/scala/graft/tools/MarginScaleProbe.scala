package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.VectorOps

/** Round-11 evidence for the candidate-fed margin miner (VERDICT r10
  * "Next #1"): on the ScaleGen embedding corpora, compare the all-pairs
  * scorer ([[VectorOps.marginMine]]) against the LSH-candidate-fed form
  * ([[VectorOps.marginMineOverPairs]]) —
  *
  *  1. pair-table size: all-pairs |src|·|tgt| vs the bucket-join count
  *     (the complexity-class difference that makes CCMatrix-scale
  *     mining possible at all);
  *  2. wall time for both forms at 1× (2k vectors), plus the LSH form
  *     at 10× (20k) where the all-pairs form is run once as the
  *     blowup exhibit;
  *  3. top-1 agreement of the LSH-fed mining against the all-pairs
  *     reference (candidate recall is the honest cost of bounding the
  *     pair set — measured, not asserted).
  *
  *   sbt "runMain graft.tools.MarginScaleProbe [base] [pairs]"
  */
object MarginScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/repo/tmp/scalegen"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def emb(dir: String): DataFrame =
      spark.read.parquet(s"$base/$dir/embeddings.parquet")
        .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))

    def sides(e: DataFrame): (DataFrame, DataFrame) =
      (e.where(col("vec_id") % 2 === 0), e.where(col("vec_id") % 2 === 1))

    // B independent 5-plane bands OR-ed — the library's banded
    // candidate generator (VectorOps.lshBandedPairs)
    def lshPairs(src: DataFrame, tgt: DataFrame, bands: Int): DataFrame =
      VectorOps.lshBandedPairs(src, tgt, "vec_id", "v", dim = 64,
        planesPerBand = 5, bands = bands)

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    for (scale <- Seq("g01", "g1")) {
      val (src, tgt) = sides(emb(scale))
      val (nS, nT) = (src.count(), tgt.count())
      // full-margin agreement needs the all-pairs reference pinned —
      // affordable at 1× (1M pairs), an OOM at 10× (100M), so the 10×
      // leg reports candidate recall@1 instead (does the candidate set
      // contain each sampled source's true nearest target — the
      // candidate-generator metric; spec (b) already proves the SCORER
      // exact under k-neighborhood containment)
      val ref: Option[DataFrame] = if (scale == "g01") Some(
        VectorOps.marginMine(src, tgt, "vec_id", "v", k = 4)
          .select(col("src_id"), col("tgt_id").as("ref_tgt"))
          .localCheckpoint(true)) else None
      val sample = src.where(col("vec_id") < 1000) // 500 sources
      val cosRef = VectorOps.topKCosine(sample, tgt, "vec_id", "v", 1)
        .select(col("query_id").as("src_id"), col("cand_id").as("nn_tgt"))
        .localCheckpoint(true)
      for (bands <- Seq(1, 2, 4)) {
        val cand = lshPairs(src, tgt, bands)
          .distinct().localCheckpoint(true)
        val nCand = cand.count()
        def runLsh(): Unit = VectorOps.marginMineOverPairs(
          lshPairs(src, tgt, bands), src, tgt, "vec_id", "v", k = 4)
          .write.format("noop").mode("overwrite").save()
        runLsh() // warm
        val lshT = med((1 to reps).map(_ => timed(runLsh())))
        val rec = cosRef.join(cand,
            cosRef("src_id") === cand("src_id") &&
              cosRef("nn_tgt") === cand("tgt_id"), "left_semi")
          .count()
        val nRef = cosRef.count()
        val agreeTxt = ref.map { r =>
          val got = VectorOps.marginMineOverPairs(cand, src, tgt,
            "vec_id", "v", k = 4)
            .select(col("src_id"), col("tgt_id").as("lsh_tgt"))
          val a = r.join(got, Seq("src_id"))
            .agg(count(lit(1)).as("n"),
              sum(when(col("ref_tgt") === col("lsh_tgt"), 1).otherwise(0))
                .as("same")).collect()(0)
          f"  top-1 agreement ${a.getLong(1)}/${a.getLong(0)}" +
            f" (${a.getLong(1).toDouble / a.getLong(0)}%5.3f)"
        }.getOrElse("")
        println(f"[margin] $scale bands=$bands: candidates $nCand%,d" +
          f" (${nS * nT / math.max(nCand, 1)}x fewer than ${nS * nT}%,d)" +
          f"  lsh-fed $lshT%6.2f s  recall@1 $rec/$nRef" +
          f" (${rec.toDouble / nRef}%5.3f)" + agreeTxt)
      }
      def runAll(): Unit = VectorOps.marginMine(src, tgt, "vec_id", "v",
        k = 4).write.format("noop").mode("overwrite").save()
      val allT = if (scale == "g01") {
        runAll(); med((1 to reps).map(_ => timed(runAll())))
      } else timed(runAll()) // 10x: once — the blowup exhibit
      println(f"[margin] $scale: all-pairs $allT%6.2f s")
    }
    spark.stop()
  }
}
