package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.SyntheticFrame
import graft.geometry.Geometry
import graft.pipeline.{Classification, FramePipeline}

/** Sub-stage timing of FramePipeline.process at production frame size
  * (dev tool): where does the per-batch wall time actually go.
  *
  *   sbt "runMain graft.tools.ProcessProbe [nFrames] [size]"
  */
object ProcessProbe {
  def main(args: Array[String]): Unit = {
    val nFrames = if (args.length > 0) args(0).toInt else 4
    val size = if (args.length > 1) args(1).toInt else 2880
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // survive multi-minute GC stalls on the throttled sandbox host
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
      println(f"[pprobe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  (gc ${(gcMs - g0) / 1000.0}%6.1f s)")
      r
    }

    val cal = SyntheticFrame.testCalibration(size)
    val (h, w) = cal.imageSize
    val px = t("frames")((1 to nFrames).map(no =>
      SyntheticFrame.frame(spark, cal, no, nHotPer10k = 2,
        spots = Seq((size / 3, size / 3, 30000.0, 3.0)),
        arcs = Seq((5.5, 20.0, 160.0, 9000.0))))
      .reduce(_ unionByName _).localCheckpoint(true))
    println(s"[pprobe] pixels = ${px.count()}")

    val flagged0 = FramePipeline.flagOutliersInline(px, cal)
    val core = t("flag+checkpoint")(flagged0.select(col("frame_no"),
        col("y"), col("x"), col("corr_i"), col("corr"), col("base_mask"),
        col("is_outlier"))
      .localCheckpoint(true))
    val flagged = Geometry.attach(core, cal)

    val slimIn = flagged.select(col("frame_no"), col("y"), col("x"),
      col("corr").as("v"))
    val sg = Geometry.scalarPixelGeo(cal)
    for (i <- 1 to 2) {
      t(s"typed noop #$i")(
        graft.stencil.Stencil.secondDirectionalDerivGeo(slimIn, w, h, sg,
          tile = 512).write.format("noop").mode("overwrite").save())
      t(s"raw noop #$i")(
        graft.stencil.Stencil.secondDirectionalDerivGeoRaw(slimIn, w, h, sg,
          tile = 512).write.format("noop").mode("overwrite").save())
    }
    val gradBoth = t("gradBoth raw+ckpt")(
      graft.stencil.Stencil.secondDirectionalDerivGeoRaw(slimIn, w, h, sg,
        tile = 512).localCheckpoint(true))

    // the production kernel since r6: narrow projection + both gradients
    // from ONE exchange (this is what process() actually checkpoints)
    t("fused narrow+ckpt")(
      graft.stencil.Stencil.secondDirectionalDerivNarrowRaw(core, w, h,
        Geometry.scalarPixelGeoInto(cal), Geometry.scalarPixelHatsInto(cal),
        tile = 512).localCheckpoint(true))

    // both percentile forms: gather-and-sort (serial per frame — crawls
    // 50x under host memory-bus throttle) vs distributed rank selection
    // (the production path since r6)
    t("globalThresh gather")(gradBoth.groupBy(col("frame_no"))
      .agg(graft.ops.PercentileAgg
        .percentileExact(col("grad2_r"), 0.1).as("g_thresh"))
      .write.format("noop").mode("overwrite").save())
    t("globalThresh select")(graft.ops.PercentileAgg
      .percentileSelect(gradBoth.select(col("frame_no"), col("grad2_r")),
        Seq("frame_no"), "grad2_r", 0.1, outCol = "g_thresh")
      .write.format("noop").mode("overwrite").save())

    val narrow = t("narrow ckpt")(flagged.select(col("frame_no"),
        col("y"), col("x"), col("x_mm"), col("y_mm"), col("corr_i"),
        col("corr"), col("base_mask"), col("is_outlier"), col("tth_bin"),
        col("q_bin"), col("q"), col("azim"), col("azim_flipped"))
      .localCheckpoint(true))

    // mirror of classify's stages for stage-level attribution
    val keys = Seq("frame_no")
    val outlierPx = narrow.where(col("is_outlier"))
      .select(col("frame_no"), col("y"), col("x"))
    // chained form first (the r4 shape, kept for in-run A/B attribution)
    val closed = t("cls:closing")(graft.stencil.Morphology
      .closing(outlierPx, 1, keys, w, h).localCheckpoint(true))
    t("cls:ccl-chained")(graft.stencil.CCL
      .labelAuto(closed, w, h, keys).write.format("noop")
      .mode("overwrite").save())
    // fused form (what classify actually runs since r5)
    val labeled0 = t("cls:fused-close+ccl")(graft.stencil.CCL
      .closeAndLabel(outlierPx, 1, w, h, keys).localCheckpoint(true))
    val labeled = t("cls:labeljoin")(narrow.select(col("frame_no"),
        col("y"), col("x"), col("q"), col("azim"), col("azim_flipped"))
      .join(broadcast(labeled0), Seq("frame_no", "y", "x"))
      .localCheckpoint(true))
    val shaped = t("cls:shape")(Classification.shapeClassify(labeled, keys)
      .localCheckpoint(true))
    val labeledFull = labeled.join(broadcast(shaped),
      Seq("frame_no", "label"))
    val flags = t("cls:gradRefine")(Classification.gradientRefine(narrow,
        labeledFull, w, h, keys, d2Precomputed = Some(gradBoth))
      .localCheckpoint(true))
    println(s"[pprobe] flag rows = ${flags.count()}")

    val joined = narrow.join(broadcast(flags.select(col("frame_no"),
        col("y"), col("x"), col("is_spot"), col("is_arc"))),
      Seq("frame_no", "y", "x"), "left")
    val integ = graft.ops.Histogram.integrate(
      joined.where(col("tth_bin") >= 0), col("tth_bin"), col("corr"),
      Seq("base" -> !col("base_mask"),
        "om" -> (!col("base_mask") && !col("is_outlier"))),
      keys = Seq(col("frame_no")))
    for (i <- 1 to 2)
      t(s"integrals #$i")(
        integ.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
