package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.PercentileAgg

/** Evidence probe for the multi-quantile routing fusion: the
  * percentileSelect machinery is EAGER (collect-routed), so its saved
  * passes never appear in a final physical plan — ScanCensus cannot see
  * them. This probe counts scheduler JOBS and wall time for
  * (a) two single-quantile percentileSelect calls vs (b) one
  * percentileSelectMulti call over the same table, the exact shape of
  * the quality_buckets / filter_length_tails consumers.
  *
  *   sbt "runMain graft.tools.MultiQuantileProbe [sfDir]"
  */
object MultiQuantileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    val lens = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("lang"),
        graft.ops.TextMetrics.tokenCount(col("text")).cast("double")
          .as("v"))
    def run(tag: String)(body: => Unit): Unit = {
      // settle listener events from the previous leg (listenerBus is
      // spark-private; a short sleep bounds the async delivery window —
      // job counts here are coarse evidence, not a exact-once ledger)
      Thread.sleep(300); jobs.set(0)
      val t0 = System.nanoTime()
      body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"MULTIQ $tag%-18s jobs=${jobs.get}%3d  $sec%6.2f s")
    }
    // warmup (scan cache, codegen)
    lens.count()
    for (rep <- 1 to 3) {
      run(s"single-x2 rep$rep") {
        PercentileAgg.percentileSelect(lens, Seq("lang"), "v", 0.05).count()
        PercentileAgg.percentileSelect(lens, Seq("lang"), "v", 0.95).count()
      }
      run(s"multi rep$rep") {
        PercentileAgg.percentileSelectMulti(lens, Seq("lang"), "v",
          Seq(0.05, 0.95), Seq("lo", "hi")).count()
      }
    }
    spark.stop()
  }
}
