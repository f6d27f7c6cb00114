package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.core.SyntheticFrame
import graft.geometry.Geometry
import graft.pipeline.{Classification, FramePipeline}

/** A/B the storage form of the ONE full-frame table every downstream
  * stage reads (dev tool). The warm attribution (WarmProbe, SCALE_r06)
  * shows a 4-frame batch re-scans the fused 14-column checkpoint ~6-8
  * times (percentile min/max + histogram + gather, the cluster joins,
  * qbinStats, integrals), and a localCheckpoint scan deserializes FULL
  * rows regardless of the consumer's projection. A columnar persist
  * (InMemoryRelation) pays a heavier build but prunes to the consumer's
  * columns on every scan. Interleaved in one JVM; fingerprints asserted
  * equal before a pair counts.
  *
  *   sbt "runMain graft.tools.CacheFormProbe [nFrames] [size] [iters]"
  */
object CacheFormProbe {
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

    def t[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[cacheform] $name%-26s $s%8.2f s")
      (r, s)
    }

    val cal = SyntheticFrame.testCalibration(size)
    val (h, w) = cal.imageSize
    val px = (1 to nFrames).map(no =>
        SyntheticFrame.frame(spark, cal, no, nHotPer10k = 2,
          spots = Seq((size / 3, size / 3, 30000.0, 3.0)),
          arcs = Seq((5.5, 20.0, 160.0, 9000.0))))
      .reduce(_ unionByName _).localCheckpoint(true)
    println(s"[cacheform] pixels = ${px.count()}")
    val keepIds = spark.sparkContext.getPersistentRDDs.keySet
    val core = FramePipeline.flagOutliersInline(px, cal)
      .select(col("frame_no"), col("y"), col("x"), col("corr_i"),
        col("corr"), col("base_mask"), col("is_outlier"))
      .localCheckpoint(true)
    val keep2 = spark.sparkContext.getPersistentRDDs.keySet
    def kernel: DataFrame =
      graft.stencil.Stencil.secondDirectionalDerivNarrowRaw(core, w, h,
        Geometry.scalarPixelGeoInto(cal), Geometry.scalarPixelHatsInto(cal),
        tile = 512)

    /** The consumer suite over a materialized fused table: classify +
      * qbinStats + integrals (the batch's actual downstream reads).
      * Returns (fingerprint, consumerSeconds). */
    def consume(fused: DataFrame): (String, Double) = {
      val fno = px.schema("frame_no").dataType
      val narrow = fused.drop("grad2_r")
        .withColumn("frame_no", col("frame_no").cast(fno))
      val gradBoth = fused.select(col("frame_no"), col("y"), col("x"),
        col("grad2_r"), col("grad2_a"), col("q_bin"))
      val t0 = System.nanoTime()
      val flags = Classification.classify(narrow, w, h, Seq("frame_no"),
          Classification.Params(), d2Precomputed = Some(gradBoth))
        .localCheckpoint(true)
      val pxJ = narrow.join(broadcast(flags.select(col("frame_no"),
          col("y"), col("x"), col("label"), col("is_spot"),
          col("is_arc"))), Seq("frame_no", "y", "x"), "left")
        .withColumn("is_spot", coalesce(col("is_spot"), lit(false)))
        .withColumn("is_arc", coalesce(col("is_arc"), lit(false)))
      val integ = graft.ops.Histogram.integrate(
          pxJ.where(col("tth_bin") >= 0), col("tth_bin"), col("corr"),
          Seq("base" -> !col("base_mask"),
            "om" -> (!col("base_mask") && !col("is_outlier"))),
          keys = Seq(col("frame_no")))
        .agg(sum(col("i_base")).cast("decimal(28,6)").as("sb"),
          sum(col("n_om")).as("nm")).collect()(0)
      val qb = FramePipeline.gradStatsOf(FramePipeline.qbinAggregate(pxJ))
        .agg(sum(col("mean")).cast("decimal(28,6)").as("gm"),
          count(lit(1)).as("n")).collect()(0)
      val nf = flags.count()
      val secs = (System.nanoTime() - t0) / 1e9
      (s"integ=$integ qb=$qb flags=$nf", secs)
    }
    def release(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!keep2.contains(id) && !keepIds.contains(id))
          rdd.unpersist(blocking = true)
      }

    var fpA: String = null
    for (i <- 1 to iters) {
      println(s"[cacheform] --- pair $i ---")
      val (fusedA, buildA) = t(s"A build localCheckpoint")(
        kernel.localCheckpoint(true))
      val ((fa, consA), _) = t(s"A consume (full suite)")(consume(fusedA))
      release()
      val (fusedB, buildB) = t(s"B build columnar persist") {
        val f = kernel.persist(StorageLevel.MEMORY_AND_DISK)
        f.count() // materialize now, like the checkpoint
        f
      }
      val ((fb, consB), _) = t(s"B consume (full suite)")(consume(fusedB))
      release()
      fusedB.unpersist(blocking = true)
      require(fa == fb, s"fingerprint mismatch:\n A=$fa\n B=$fb")
      if (fpA == null) fpA = fa else require(fpA == fa, "drift across pairs")
      println(f"[cacheform] pair $i: total A=${buildA + consA}%.2f" +
        f" B=${buildB + consB}%.2f ratio=${(buildA + consA) / (buildB + consB)}%.2f" +
        f" (build ${buildA}%.2f vs ${buildB}%.2f," +
        f" consume ${consA}%.2f vs ${consB}%.2f)")
    }
    println(s"[cacheform] fingerprint: $fpA")
    spark.stop()
  }
}
