package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{Opq, Pca, Pq, VectorOps}

/** Measurement instrument for the OPQ-lite question (round-10 order #5):
  * does rotating the corpus' top principal direction onto e1 before the
  * PQ subspace split change ADC recall? The rotation is an isometry
  * (OpqSpec), so the exact-L2 ground truth is IDENTICAL for both legs —
  * the recall delta isolates quantization quality.
  *
  * Two corpora:
  *  - the real sf embeddings table (the deployed geometry);
  *  - a synthetic adversarial geometry whose dominant variance runs
  *    DIAGONALLY across all subspaces (a direction no axis-aligned
  *    subspace split can see) — the case rotation exists for.
  *
  *   sbt "runMain graft.tools.OpqRecallProbe [sfDir]"
  */
object OpqRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dim = 64; val sub = 8; val k = 16; val iters = 2

    def recall(vecs: DataFrame, tag: String): Unit = {
      val queries = vecs.where(col("vec_id") % 25 === 0)
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("d"), col("cand_id"))
      val brute = vecs
        .crossJoin(broadcast(queries.select(col("vec_id").as("query_id"),
          col("v").as("qv"))))
        .where(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("cand_id"),
          VectorOps.dot(zip_with(col("qv"), col("v"), _ - _),
            zip_with(col("qv"), col("v"), _ - _)).as("d"))
        .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
        .select(col("query_id"), col("cand_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      def leg(vv: DataFrame, name: String): Unit = {
        val (cb, _) = Pq.train(vv, "vec_id", "v", sub, dim, k, iters)
        val codes = Pq.encodeLocal(vv, "vec_id", "v", cb, sub, dim)
          .localCheckpoint(true)
        val qs = vv.where(col("vec_id") % 25 === 0)
        def pairs(df: DataFrame) = df
          .select(col("query_id"), col("cand_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val adc5 = pairs(Pq.searchAdc(qs, "vec_id", "v", codes, cb,
          sub, dim, 5))
        val short40 = pairs(Pq.searchAdc(qs, "vec_id", "v", codes, cb,
          sub, dim, 40))
        val rr5 = pairs(Pq.searchRerank(qs, "vec_id", "v", vv, "vec_id",
          "v", codes, cb, sub, dim, shortlist = 40, topK = 5))
        println(f"OPQRECALL $tag%-10s $name%-8s " +
          f"adc@5=${(brute & adc5).size.toDouble / brute.size}%.3f " +
          f"short40=${(brute & short40).size.toDouble / brute.size}%.3f " +
          f"rerank@5=${(brute & rr5).size.toDouble / brute.size}%.3f")
      }

      leg(vecs, "plain")
      val (_, dir) = Pca.fit(vecs, "v")
      val u = Opq.householderU(dir)
      println(s"OPQRECALL $tag u=${if (u.isEmpty) "identity"
        else f"|u|=${math.sqrt(u.map(x => x * x).sum)}%.3f"}")
      // rotated leg: SAME ids, rotated vectors; ground truth unchanged
      // by isometry
      leg(vecs.select(col("vec_id"), Opq.rotate(col("v"), u).as("v"))
        .localCheckpoint(true), "rotated")
    }

    /** The STANDARDIZED leg is NOT an isometry (per-dim 1/sigma scaling
      * changes the metric), so its recall is measured against exact
      * neighbors IN THE STANDARDIZED SPACE — the self-consistent
      * question "how well does PQ quantize this representation", not
      * comparable 1:1 against the plain leg's original-space truth. */
    def stdCorpus(vecs: DataFrame): DataFrame = {
      val mean = Pca.meanVector(vecs, "v")
      val sigma = Pca.dimStats(vecs, "v", mean)
        .orderBy("i").collect().map(_.getDouble(2))
      vecs.select(col("vec_id"),
        Pca.standardize(col("v"), mean, sigma).as("v"))
        .localCheckpoint(true)
    }

    // real corpus
    val real = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    recall(real, "real")
    recall(stdCorpus(real), "real-std")

    // adversarial geometry: cluster centers spread along a DIAGONAL
    // direction (equal energy in every dim — crosses all 8 subspaces),
    // tight isotropic noise; ids shuffled (the PqRecallSpec init rule)
    val rnd = new scala.util.Random(17)
    val diag = Array.fill(dim)(1.0 / math.sqrt(dim))
    val centers = (0 until 10).map { c =>
      val t = (c - 4.5) * 6.0
      Array.tabulate(dim)(i => diag(i) * t + rnd.nextGaussian() * 0.3)
    }
    val raw = centers.flatMap { c =>
      (0 until 60).map(_ => c.map(_ + rnd.nextGaussian() * 0.5).toSeq)
    }
    val synth = rnd.shuffle(raw).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "v")
      .localCheckpoint(true)
    recall(synth, "diagonal")
    // std corpus' "rotated" leg = the full standardize -> rotate -> PQ
    // whitening chain (each leg's truth is its own space's exact top-5)
    recall(stdCorpus(synth), "diag-std")

    spark.stop()
  }
}
