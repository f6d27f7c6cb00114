package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.core.SyntheticFrame
import graft.geometry.Geometry
import graft.pipeline.{Classification, FramePipeline}

/** WARM per-stage attribution of the production process() path (dev
  * tool): the cold ProcessProbe numbers include JIT + first-touch
  * allocation, which the 6-batch StreamSmoke showed dominate batch 1
  * (227 s vs 30 s warm at 4×2880² — SCALE_r06.md). This loops the exact
  * stage mirror of FramePipeline.process N times in one JVM, releasing
  * the per-iteration checkpoints between rounds, so the last iterations
  * are the steady-state cost a long-running stream actually pays.
  *
  *   sbt "runMain graft.tools.WarmProbe [nFrames] [size] [iters]"
  */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val nFrames = if (args.length > 0) args(0).toInt else 4
    val size = if (args.length > 1) args(1).toInt else 2880
    val iters = if (args.length > 2) args(2).toInt else 3
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
    // per-stage Spark JOB count: scheduler round-trips are the latency
    // story at 1000 executors (a stage that is cheap on local[32] but
    // fires 15 jobs pays 15 driver barriers on a real cluster)
    val jobCount = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCount.incrementAndGet()
      })
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val g0 = gcMs; val j0 = jobCount.get()
      val r = f
      println(f"[warm] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  (gc ${(gcMs - g0) / 1000.0}%6.1f s, jobs ${jobCount.get() - j0}%3d)")
      r
    }

    val cal = SyntheticFrame.testCalibration(size)
    val (h, w) = cal.imageSize
    val px = t("frames")((1 to nFrames).map(no =>
      SyntheticFrame.frame(spark, cal, no, nHotPer10k = 2,
        spots = Seq((size / 3, size / 3, 30000.0, 3.0)),
        arcs = Seq((5.5, 20.0, 160.0, 9000.0))))
      .reduce(_ unionByName _).localCheckpoint(true))
    println(s"[warm] pixels = ${px.count()}")
    val keep = spark.sparkContext.getPersistentRDDs.keySet

    for (i <- 1 to iters) {
      println(s"[warm] --- iteration $i ---")
      val core = t(s"flag+core ckpt")(
        FramePipeline.flagOutliersInline(px, cal)
          .select(col("frame_no"), col("y"), col("x"), col("corr_i"),
            col("corr"), col("base_mask"), col("is_outlier"))
          .localCheckpoint(true))
      val fused = t(s"fused stencil ckpt")(
        graft.stencil.Stencil.secondDirectionalDerivNarrowRaw(core, w, h,
          Geometry.scalarPixelGeoInto(cal), Geometry.scalarPixelHatsInto(cal),
          tile = 512).localCheckpoint(true))
      val fno = px.schema("frame_no").dataType
      val narrow = fused.drop("grad2_r")
        .withColumn("frame_no", col("frame_no").cast(fno))
      val gradBoth = fused.select(col("frame_no"), col("y"), col("x"),
        col("grad2_r"), col("grad2_a"), col("q_bin"))
      val flags = t(s"classify+ckpt")(
        Classification.classify(narrow, w, h, Seq("frame_no"),
            Classification.Params(), d2Precomputed = Some(gradBoth),
            cal = Some(cal))
          .localCheckpoint(true))
      t(s"flag count")(flags.count())
      // classify sub-stage mirror (same shapes as Classification.classify)
      // for warm interior attribution — results unused, stages timed
      val keys = Seq("frame_no")
      val outlierPx = narrow.where(col("is_outlier"))
        .select(col("frame_no"), col("y"), col("x"))
      val labeled0 = t(s"  cls:close+ccl")(graft.stencil.CCL
        .closeAndLabel(outlierPx, 1, w, h, keys).localCheckpoint(true))
      val labeled = t(s"  cls:labeljoin")(narrow.select(col("frame_no"),
          col("y"), col("x"), col("q"), col("azim"), col("azim_flipped"))
        .join(broadcast(labeled0), Seq("frame_no", "y", "x"))
        .localCheckpoint(true))
      t(s"  cls:labelattach")(Geometry.attach(labeled0, cal)
        .select(col("frame_no"), col("y"), col("x"), col("q"),
          col("azim"), col("azim_flipped"), col("label"))
        .localCheckpoint(true))
      val shaped = t(s"  cls:shape")(Classification
        .shapeClassify(labeled, keys).localCheckpoint(true))
      val labeledFull = labeled.join(broadcast(shaped),
        Seq("frame_no", "label"))
      t(s"  cls:pctSelect")(graft.ops.PercentileAgg.percentileSelect(
          gradBoth.select(col("frame_no"), col("grad2_r")), keys,
          "grad2_r", Classification.Params().globalPercentile,
          outCol = "g_thresh")
        .write.format("noop").mode("overwrite").save())
      t(s"  cls:gradRefine")(Classification.gradientRefine(narrow,
          labeledFull, w, h, keys, d2Precomputed = Some(gradBoth))
        .write.format("noop").mode("overwrite").save())
      val pxJ = narrow.join(broadcast(flags.select(col("frame_no"),
          col("y"), col("x"), col("label"), col("is_spot"),
          col("is_arc"))), Seq("frame_no", "y", "x"), "left")
        .withColumn("is_spot", coalesce(col("is_spot"), lit(false)))
        .withColumn("is_arc", coalesce(col("is_arc"), lit(false)))
      t(s"integrals")(graft.ops.Histogram.integrate(
          pxJ.where(col("tth_bin") >= 0), col("tth_bin"), col("corr"),
          Seq("base" -> !col("base_mask"),
            "om" -> (!col("base_mask") && !col("is_outlier"))),
          keys = Seq(col("frame_no")))
        .write.format("noop").mode("overwrite").save())
      t(s"qbinStats")(FramePipeline.gradStatsOf(
          FramePipeline.qbinAggregate(pxJ))
        .write.format("noop").mode("overwrite").save())
      // release this iteration's pins (keep px) so the next round
      // re-runs the stages instead of reading a cache
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!keep.contains(id)) rdd.unpersist(blocking = true)
      }
    }
    spark.stop()
  }
}
