package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
/** Sub-phase timing of PqStage.staged + stagedOpq (dev probe): where do
  * the pq_stage seconds go — train, encode+checkpoint, cell join,
  * centroids, OPQ rotation — cold (rep1, Janino codegen included) vs
  * warm (rep2)? */
object PqStageBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.{PqStage, PcaStage}
    def timed[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PQB $n%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    // bench-equivalent warmup
    graft.SparkEntry.queries("q1_pricing")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    for (rep <- 1 to 2) {
      println(s"===== rep $rep =====")
      val s = spark.newSession()
      def fan(df: DataFrame): DataFrame =
        df.repartition(s.sparkContext.defaultParallelism,
          xxhash64(col(df.columns.head)))
      timed("pca_fitted")(PcaStage.fitted(s, sfDir))
      val eFan = timed("plan eFan")(fan(PqStage.embeddings(s, sfDir)))
      val e = PqStage.embeddings(s, sfDir)
      val cb = timed("train")(graft.ops.Pq.train(eFan, "vec_id", "v",
        PqStage.Sub, PqStage.Dim, PqStage.K, PqStage.Iters)._1)
      val codes = timed("encode_ckpt")(
        graft.ops.Pq.encodeLocal(eFan, "vec_id", "v", cb,
          PqStage.Sub, PqStage.Dim)
          .repartition(1, col("id")).localCheckpoint(eager = true))
      timed("withCell_ckpt")(codes
        .join(e.select(col("vec_id").as("id"), col("label")), "id")
        .localCheckpoint(eager = true))
      timed("cellCentroids")(PqStage.cellCentroids(s, sfDir))
      timed("opq_u")(graft.ops.Opq.householderU(
        PcaStage.fitted(s, sfDir).direction))
      val u = graft.ops.Opq.householderU(PcaStage.fitted(s, sfDir).direction)
      val rot = timed("opq_rot_ckpt")(
        fan(PqStage.embeddings(s, sfDir))
          .select(col("vec_id"), col("label"),
            graft.ops.Opq.rotate(col("v"), u).as("v"))
          .repartition(1, col("vec_id")).localCheckpoint(eager = true))
      val rotFan = fan(rot)
      val cb2 = timed("opq_train")(graft.ops.Pq.train(rotFan, "vec_id", "v",
        PqStage.Sub, PqStage.Dim, PqStage.K, PqStage.Iters)._1)
      val codes2 = timed("opq_encode_ckpt")(
        graft.ops.Pq.encodeLocal(rotFan, "vec_id", "v", cb2,
          PqStage.Sub, PqStage.Dim)
          .repartition(1, col("id")).localCheckpoint(eager = true))
      timed("opq_withCell_ckpt")(codes2
        .join(rot.select(col("vec_id").as("id"), col("label")), "id")
        .localCheckpoint(eager = true))
    }
    spark.stop()
  }
}
