package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.SyntheticFrame
import graft.geometry.Geometry
import graft.stencil.Stencil

/** Interleaved A/B of the round-6 structural changes (dev tool, FuseBench
  * protocol: both legs back-to-back inside one JVM so host-noise regimes
  * cancel; outputs checked equivalent before a pair's timing counts).
  *
  *  A/B 1 — d2+narrow fusion: chained form (Geometry.attach → grad-only
  *  raw stencil checkpoint + separate 14-column narrow checkpoint, the
  *  r5 plan) vs the fused kernel (ONE checkpoint carrying narrow columns
  *  + both gradients).
  *
  *  A/B 2 — stats consolidation: chained A8+A9 (gradient moments groupBy,
  *  two-stage median/MAD with a broadcast join, separate spottiness
  *  groupBy — three jobs over the pixel table) vs the shared one-pass
  *  per-(frame, q_bin) aggregate.
  *
  *   sbt "runMain graft.tools.NarrowFuseBench [nFrames] [size] [pairs]"
  */
object NarrowFuseBench {
  def main(args: Array[String]): Unit = {
    val nFrames = if (args.length > 0) args(0).toInt else 4
    val size = if (args.length > 1) args(1).toInt else 2880
    val pairs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // survive multi-minute GC stalls on the throttled sandbox host
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "1200s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cal = SyntheticFrame.testCalibration(size)
    val (h, w) = cal.imageSize
    val px = (1 to nFrames).map(no =>
      SyntheticFrame.frame(spark, cal, no, nHotPer10k = 2,
        spots = Seq((size / 3, size / 3, 30000.0, 3.0)),
        arcs = Seq((5.5, 20.0, 160.0, 9000.0))))
      .reduce(_ unionByName _)
    val core = graft.pipeline.FramePipeline.flagOutliersInline(px, cal)
      .select(col("frame_no"), col("y"), col("x"), col("corr_i"),
        col("corr"), col("base_mask"), col("is_outlier"))
      .localCheckpoint(true)
    println(s"[nfbench] core pixels = ${core.count()} " +
      s"(${nFrames}x${size}x$size)")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    /** Equivalence fingerprint over the narrow+grad columns: exact int
      * sums + counts (doubles differ only in aggregation order). */
    def sig(narrow: DataFrame, grads: DataFrame): (Long, Long, Long, Long) = {
      val a = narrow.agg(count(lit(1)), sum(col("tth_bin").cast("long")),
        sum(col("q_bin").cast("long"))).head()
      val b = grads.agg(count(lit(1))).head()
      (a.getLong(0), a.getLong(1), a.getLong(2), b.getLong(0))
    }

    // ---- A/B 1: chained narrow+grad materializations vs fused kernel --
    val ratios1 = (1 to pairs).map { i =>
      val (sa, ta) = time {
        val flagged = Geometry.attach(core, cal)
        val gb = Stencil.secondDirectionalDerivGeoRaw(
            flagged.select(col("frame_no"), col("y"), col("x"),
              col("corr").as("v")), w, h,
            Geometry.scalarPixelGeo(cal), tile = 512)
          .localCheckpoint(true)
        val nr = flagged.select(col("frame_no"), col("y"), col("x"),
            col("x_mm"), col("y_mm"), col("corr_i"), col("corr"),
            col("base_mask"), col("is_outlier"), col("tth_bin"),
            col("q_bin"), col("q"), col("azim"), col("azim_flipped"))
          .localCheckpoint(true)
        val s = sig(nr, gb)
        nr.unpersist(); gb.unpersist(); s
      }
      val (sb, tb) = time {
        val fz = Stencil.secondDirectionalDerivNarrowRaw(core, w, h,
            Geometry.scalarPixelGeoInto(cal), Geometry.scalarPixelHatsInto(cal),
            tile = 512)
          .localCheckpoint(true)
        val s = sig(fz.drop("grad2_r", "grad2_a"),
          fz.select(col("frame_no"), col("grad2_a")))
        fz.unpersist(); s
      }
      require(sa == sb, s"fused != chained fingerprints: $sa vs $sb")
      println(f"[nfbench] d2+narrow pair $i: chained $ta%7.2f s   " +
        f"fused $tb%7.2f s   ratio ${ta / tb}%5.2fx")
      ta / tb
    }

    // ---- A/B 2: chained A8+A9 (3 jobs) vs shared one-pass aggregate ---
    // real pipeline row shape: fused table + synthetic-but-deterministic
    // flag columns (labels from pixel ids on outliers)
    val fz = Stencil.secondDirectionalDerivNarrowRaw(core, w, h,
        Geometry.scalarPixelGeoInto(cal), Geometry.scalarPixelHatsInto(cal),
        tile = 512)
      .localCheckpoint(true)
    val pxs = fz.withColumn("is_spot",
        col("is_outlier") && col("corr") > 1000)
      .withColumn("is_arc", col("is_outlier") && col("azim") > 180)
      .withColumn("label",
        when(col("is_spot"), col("y").cast("long") * w + col("x")))
    val ratios2 = (1 to pairs).map { i =>
      val (na, ta) = time {
        val mm = graft.ops.RobustStats.medianMad(
          pxs.select(col("frame_no"), col("q_bin"),
            col("grad2_a").as("g")), Seq("frame_no", "q_bin"), "g")
        val moments = pxs.groupBy(col("frame_no"), col("q_bin"))
          .agg(avg(col("grad2_a")).as("mean"),
            stddev(col("grad2_a")).as("std"))
        val grad = moments.join(mm, Seq("frame_no", "q_bin"))
        val spotty = pxs.groupBy(col("frame_no"), col("q_bin"))
          .agg((count(when(col("is_outlier") || col("is_spot") ||
            col("is_arc"), 1)).cast("double") / count(lit(1)))
            .as("pct_masked"),
            countDistinct(when(col("is_spot"), col("label")))
              .as("n_spots"))
        grad.count() + spotty.count()
      }
      val (nb, tb) = time {
        val qb = graft.pipeline.FramePipeline.qbinAggregate(pxs)
          .localCheckpoint(true)
        val n = qb.count() * 2 // both views of the one table
        qb.unpersist(); n
      }
      require(na == nb, s"stats row counts differ: $na vs $nb")
      println(f"[nfbench] stats pair $i:     chained $ta%7.2f s   " +
        f"fused $tb%7.2f s   ratio ${ta / tb}%5.2fx")
      ta / tb
    }

    def geomean(xs: Seq[Double]): Double =
      math.exp(xs.map(math.log).sum / xs.size)
    println(f"[nfbench] GEOMEAN d2+narrow ${geomean(ratios1)}%5.2fx   " +
      f"stats ${geomean(ratios2)}%5.2fx")
    spark.stop()
  }
}
