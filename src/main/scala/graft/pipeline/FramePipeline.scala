package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Calibration, SyntheticFrame}
import graft.geometry.Geometry
import graft.ops.{Histogram, RobustStats}

/** The per-frame analytics plan (SURVEY §3.2) as one DataFrame lineage:
  *
  *   pixels ⋈ geometry → corrections → base mask → per-ring robust outlier
  *   mask → masked azimuthal integration (all variants, one shuffle) →
  *   per-ring stats.
  *
  * Reference: run_iteration pipeline.py:78-567. Catalyst fuses the
  * elementwise stages into generated code; shuffles appear only at the
  * grouped aggregations. The geometry side is produced once per calibration
  * (Geometry.buildCached) and joined per frame; with both sides
  * tile-bucketed the join is co-partitioned and shuffle-free.
  */
object FramePipeline {

  /** Corrected intensity: flat-field (unity here), polarization divide,
    * solid-angle dist^1.5 multiply (reference pipeline.py:63-71,
    * corrections_and_maps.py:25-37). */
  def corrected(intensity: Column): Column =
    intensity / col("pol") * pow(col("dist_sq"), 1.5)

  /** Base mask: non-positive ∨ out-of-azimuth ∨ out-of-tth-range
    * (reference pipeline.py:148-165, nonzeromask
    * corrections_and_maps.py:14-21). True = excluded. */
  def baseMask(intensity: Column): Column =
    intensity <= 0 || !col("in_azim_range") || !col("in_tth_range")

  /** Full per-frame plan over a (frame_no, y, x, intensity) pixel table.
    * Returns the integral table (frame_no, tth_bin, tth, i_base, n_base,
    * i_om, n_om). */
  def integrateFrame(pixels: DataFrame, geometry: DataFrame,
                     cal: Calibration, esdMul: Double = 3.0): DataFrame = {
    val px = pixels.join(geometry, Seq("y", "x"))
      .withColumn("corr", corrected(col("intensity")))
      .withColumn("base_mask", baseMask(col("intensity")))

    // A1: per-ring median/MAD outlier flag on raw intensity over 2-theta
    // rings; masked pixels are excluded from the ring statistics up front
    // (reference fmask.c:221-230 tests the frame mask in the bucket pass).
    val live = px.where(!col("base_mask"))
    val ringStats = RobustStats.medianMad(
      live.select(col("frame_no"), col("tth_bin"),
        col("intensity").cast("double").as("ival")),
      Seq("frame_no", "tth_bin"), "ival")

    val flagged = px.join(broadcast(ringStats), Seq("frame_no", "tth_bin"),
        "left")
      .withColumn("is_outlier", coalesce(
        !col("base_mask") && col("n") >= 10 &&
        abs(col("intensity") - col("med")) >
          lit(esdMul * RobustStats.MadToSigma) * col("mad"), lit(false)))

    // A2: all mask variants in ONE aggregation (reference runs four
    // bincount passes, pipeline.py:377-414).
    val variants = Seq(
      "base" -> !col("base_mask"),
      "om" -> (!col("base_mask") && !col("is_outlier")))
    Histogram.integrate(
        flagged.where(col("tth_bin") >= 0), col("tth_bin"), col("corr"),
        variants, keys = Seq(col("frame_no")))
      .withColumnRenamed("bin", "tth_bin")
      .withColumn("tth",
        lit(cal.ioTth._1) + (col("tth_bin") + 0.5) * cal.tthStep)
      .orderBy(col("tth_bin"))
  }

  /** Flagship demo: synthetic 256x256 frame end-to-end. */
  def demo(spark: SparkSession): DataFrame = {
    val cal = SyntheticFrame.testCalibration(256)
    val geo = Geometry.build(spark, cal)
    val frame = SyntheticFrame.frame(spark, cal, frameNo = 1)
    integrateFrame(frame, geo, cal)
  }
}
