package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** Interleaved in-one-JVM A/B for the staged-builder scan fan-out
  * question: do the PcaStage fit passes, the PqStage encode/centroid
  * materializations and the BpeStage corpus scan gain from the
  * small-input fan-out (they read the raw single-row-group parquet
  * today, so their per-row compute serializes on one core)? Each rep
  * runs BOTH arms back to back, so the host's minutes-period bus
  * throttle hits the arms equally. */
object StageFanoutAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.{OracleQueries, PqStage}
    def fan(df: DataFrame): DataFrame =
      df.repartition(spark.sparkContext.defaultParallelism,
        xxhash64(col(df.columns.head)))
    def emb(fanned: Boolean): DataFrame = {
      val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
      (if (fanned) fan(raw) else raw)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
    }
    def docs(fanned: Boolean): DataFrame = {
      val raw = spark.read.parquet(s"$sfDir/documents.parquet")
      if (fanned) fan(raw) else raw
    }
    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"AB $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    // warm both shapes once
    graft.ops.Pca.fit(spark.read.parquet(s"$sfDir/embeddings.parquet"),
      "embedding", 8)
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    for (r <- 1 to reps) {
      println(s"===== rep $r =====")
      for (fanned <- Seq(false, true)) {
        val tag = if (fanned) "fan" else "raw"
        timed(s"pca_fit/$tag") {
          graft.ops.Pca.fit(
            (if (fanned) fan _ else identity[DataFrame] _)(
              spark.read.parquet(s"$sfDir/embeddings.parquet")),
            "embedding", 8)
        }
        timed(s"pca_dimstats/$tag") {
          val e = (if (fanned) fan _ else identity[DataFrame] _)(
            spark.read.parquet(s"$sfDir/embeddings.parquet"))
          val mean = graft.ops.Pca.meanVector(e, "embedding")
          graft.ops.Pca.dimStats(e, "embedding", mean)
            .orderBy("i").collect()
        }
        // PQ encode+checkpoint: the staged() body minus training
        timed(s"pq_encode_ckpt/$tag") {
          val e = emb(fanned)
          val st = PqStage.staged(spark, sfDir) // memoized: codebook only
          val codes = graft.ops.Pq.encodeLocal(e, "vec_id", "v",
            st.codebook, PqStage.Sub, PqStage.Dim)
            .localCheckpoint(eager = true)
          val withCell = codes
            .join(e.select(col("vec_id").as("id"), col("label")), "id")
            .localCheckpoint(eager = true)
          withCell.unpersist(blocking = true)
          codes.unpersist(blocking = true)
        }
        timed(s"pq_cell_centroids/$tag") {
          emb(fanned)
            .select(col("label"), posexplode(col("v")).as(Seq("i", "x")))
            .groupBy(col("label"), col("i"))
            .agg((sum(col("x").cast("decimal(18,9)")).cast("double") /
              count(lit(1))).as("c"))
            .groupBy(col("label"))
            .agg(transform(array_sort(collect_list(struct(col("i"),
              col("c")))), s => s.getField("c")).as("cv"))
            .write.format("noop").mode("overwrite").save()
        }
        timed(s"bpe_train/$tag") {
          graft.ops.Bpe.train(docs(fanned), "text",
            graft.queries.BpeStage.Merges)
        }
      }
    }
    spark.stop()
  }
}
