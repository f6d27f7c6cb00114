package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
/** Per-job wall-time probe: runMain graft.tools.JobProbe <query>[,<query>] */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var t0 = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (s, d) = starts.getOrDefault(j.jobId, (System.nanoTime(), "?"))
        println(f"JOB ${j.jobId}%3d ${(System.nanoTime() - s) / 1e9}%7.3f s  (at ${(s - t0) / 1e9}%7.3f)  $d")
      }
    })
    graft.SparkEntry.queries("q1_pricing")(spark, sfDir)
      .write.format("noop").mode("overwrite").save() // warmup
    for (q <- args(0).split(",")) {
      for (r <- 1 to 2) {
        println(s"===== $q rep$r =====")
        t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"TOTAL $q rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
