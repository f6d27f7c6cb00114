package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.KMeans
/** Interleaved A/B of the two KMeans.fit assignment forms (dev probe). */
object KmFormBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // OLD form: relational assign + per-iteration collect (the r15 shape)
    def fitOld(k: Int, iters: Int): DataFrame = {
      val initRows = e.orderBy(col("vec_id")).limit(k)
        .select(col("vec_id").cast("long").as("cid"), col("v").as("cv"))
        .collect()
      var cent = initRows.toSeq.map(r => r.getLong(0) -> r.getSeq[Double](1))
      (2 to iters).foreach { _ =>
        import spark.implicits._
        val upd = KMeans.recentroid(
            KMeans.assign(e, cent.toDF("cid", "cv"), "vec_id"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
        cent = cent.map { case (c, cv) => c -> upd.getOrElse(c, cv) }
      }
      import spark.implicits._
      KMeans.assign(e, cent.toDF("cid", "cv"), "vec_id")
        .select(col("vec_id"), col("cid"), round(col("d"), 6).as("d"))
    }
    def fitNew(k: Int, iters: Int): DataFrame =
      KMeans.fit(e, "vec_id", k, iters)
        .select(col("vec_id"), col("cid"), round(col("d"), 6).as("d"))
    noop(fitNew(4, 2)); noop(fitOld(4, 2)) // warm both codegen paths
    for (r <- 1 to 5) {
      val t0 = System.nanoTime(); noop(fitOld(4, 2))
      val t1 = System.nanoTime(); noop(fitNew(4, 2))
      val t2 = System.nanoTime()
      println(f"KMFORM rep$r old ${(t1 - t0) / 1e9}%.3f new ${(t2 - t1) / 1e9}%.3f")
    }
    spark.stop()
  }
}
