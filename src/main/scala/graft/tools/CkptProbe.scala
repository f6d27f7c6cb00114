package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.core.SyntheticFrame
import graft.geometry.Geometry
import graft.pipeline.FramePipeline

/** A/B the storage level of the big per-batch materializations (dev
  * tool): the 33M-row checkpoints (flag core, narrow projection, fused
  * gradient field) dominate batch wall time once the kernels are cheap,
  * and deserialized row-object caching is a GC-pressure trap at that row
  * count. Alternates levels in ONE JVM so host noise cancels.
  *
  *   sbt "runMain graft.tools.CkptProbe [nFrames] [size]"
  */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val nFrames = if (args.length > 0) args(0).toInt else 4
    val size = if (args.length > 1) args(1).toInt else 2880
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ckpt] $name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val cal = SyntheticFrame.testCalibration(size)
    val (h, w) = cal.imageSize
    val px = t("frames")((1 to nFrames).map(no =>
      SyntheticFrame.frame(spark, cal, no, nHotPer10k = 2,
        spots = Seq((size / 3, size / 3, 30000.0, 3.0)),
        arcs = Seq((5.5, 20.0, 160.0, 9000.0))))
      .reduce(_ unionByName _).localCheckpoint(true))

    val core = FramePipeline.flagOutliersInline(px, cal)
      .select(col("frame_no"), col("y"), col("x"), col("corr_i"),
        col("corr"), col("base_mask"), col("is_outlier"))
      .localCheckpoint(true)
    val flagged = Geometry.attach(core, cal)
    val slimIn = flagged.select(col("frame_no"), col("y"), col("x"),
      col("corr").as("v"))
    val sg = Geometry.scalarPixelGeo(cal)
    def gradBoth = graft.stencil.Stencil
      .secondDirectionalDerivGeoRaw(slimIn, w, h, sg, tile = 512)

    for (i <- 1 to 2) {
      val a = t(s"ckpt DESER #$i")(gradBoth.localCheckpoint(true))
      t(s"  read x2 DESER #$i") {
        a.agg(sum(col("grad2_r"))).collect()
        a.agg(sum(col("grad2_a"))).collect()
      }
      a.unpersist(blocking = true)
      val b = t(s"ckpt SER #$i")(
        gradBoth.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER))
      t(s"  read x2 SER #$i") {
        b.agg(sum(col("grad2_r"))).collect()
        b.agg(sum(col("grad2_a"))).collect()
      }
      b.unpersist(blocking = true)
      val c = t(s"no ckpt: 2 plan execs #$i") {
        gradBoth.agg(sum(col("grad2_r"))).collect()
        gradBoth.agg(sum(col("grad2_a"))).collect()
      }
    }
    spark.stop()
  }
}
