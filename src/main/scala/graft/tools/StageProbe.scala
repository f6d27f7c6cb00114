package graft.tools
import org.apache.spark.sql.SparkSession
/** Phase-level timing of the staged index builders (dev probe). */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $n%-18s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); r
    }
    // warm
    graft.SparkEntry.queries("q1_pricing")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    import graft.queries._
    timed("pca_fitted")(PcaStage.fitted(spark, sfDir))
    timed("pca_dimstats")(PcaStage.dimStats(spark, sfDir))
    timed("pq_staged")(PqStage.staged(spark, sfDir))
    timed("pq_stagedOpq")(PqStage.stagedOpq(spark, sfDir))
    timed("bpe_staged")(BpeStage.staged(spark, sfDir))
    // second session to split pq_staged internals
    val s2 = spark.newSession()
    timed("s2 pca_fitted")(PcaStage.fitted(s2, sfDir))
    timed("s2 pq_train")({
      val e = PqStage.embeddings(s2, sfDir)
      graft.ops.Pq.train(e, "vec_id", "v", PqStage.Sub, PqStage.Dim, PqStage.K, PqStage.Iters)
    })
    spark.stop()
  }
}
