package graft.tools
import org.apache.spark.sql.SparkSession
/** Interleaved A/B of the small-input scan fan-out (dev probe):
  * alternates fanout-off / fanout-on per rep inside ONE session, so
  * host phase hits both arms equally. */
object FanoutAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(q: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val qs = args(0).split(",")
    qs.foreach { q => // warm both arms
      spark.conf.set("spark.graft.scan.fanoutMaxBytes", "0"); run(q)
      spark.conf.set("spark.graft.scan.fanoutMaxBytes", String.valueOf(256L << 20)); run(q)
    }
    for (q <- qs) {
      val offs = collection.mutable.ArrayBuffer[Double]()
      val ons = collection.mutable.ArrayBuffer[Double]()
      for (_ <- 1 to 2) {
        spark.conf.set("spark.graft.scan.fanoutMaxBytes", "0")
        offs += run(q)
        spark.conf.set("spark.graft.scan.fanoutMaxBytes", String.valueOf(256L << 20))
        ons += run(q)
      }
      println(f"FANOUT $q off ${offs.min}%.3f/${offs.sum / offs.size}%.3f on ${ons.min}%.3f/${ons.sum / ons.size}%.3f (min/mean)")
    }
    spark.stop()
  }
}
