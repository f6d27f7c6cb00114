package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.SyntheticFrame
import graft.pipeline.FramePipeline

/** Is the pixel-flags checkpoint superlinear in frame count, or was
  * ScaleSmoke's 8-frame 33 s (vs 3.7 s at 2 frames) a first-pass GC /
  * warm-up artifact? Interleaved 8-vs-2-frame legs of the SAME stage in
  * ONE JVM over one shared process() state — only within-run ratios are
  * host-valid (SCALE_r06.md).
  *
  *   sbt "runMain graft.tools.PixFlagsProbe [size]"   # needs 64g at 2880
  */
object PixFlagsProbe {
  def main(args: Array[String]): Unit = {
    val size = if (args.length > 0) args(0).toInt else 2880
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "1200s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val g0 = gcMs
      val r = f
      println(f"[pixflags] $name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  (gc ${(gcMs - g0) / 1000.0}%6.1f s)")
      r
    }

    val cal = SyntheticFrame.testCalibration(size)
    val geo = graft.geometry.Geometry.build(spark, cal).localCheckpoint(true)
    val px = t("frames x8")((1 to 8).map(no =>
      SyntheticFrame.frame(spark, cal, no, nHotPer10k = 2,
        spots = Seq((size / 3, size / 3, 30000.0, 3.0)),
        arcs = Seq((5.5, 20.0, 160.0, 9000.0))))
      .reduce(_ unionByName _).localCheckpoint(true))
    val out = t("process x8")(FramePipeline.process(px, geo, cal))
    val sel = out.pixels.select(col("frame_no"), col("y"), col("x"),
      col("base_mask"), col("is_outlier"), col("is_spot"), col("is_arc"))

    for (i <- 1 to 3) {
      val a = t(s"pixflags 8f #$i")(sel.localCheckpoint(true))
      a.unpersist(blocking = true)
      val b = t(s"pixflags 2f #$i")(
        sel.where(col("frame_no") <= 2).localCheckpoint(true))
      b.unpersist(blocking = true)
    }
    spark.stop()
  }
}
