package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Correction-frame algebra (reference `_getCorrImage`
  * GSASII_imports.py:660-735): optional dark-current subtraction,
  * background subtraction, gain-map multiply, flat-background subtract and
  * flat-field multiply, each supplied as a per-pixel frame joined on
  * (y, x).
  *
  * Correction frames are calibration-scoped like the geometry table: at
  * scale they are broadcast or bucket-joined once and reused for every
  * data frame. All arithmetic is plain column math inside codegen.
  */
object Corrections {

  /** The correction-frame bundle a pipeline run carries (reference
    * cache["flatfield"] etc., pipeline.py:135-146). Each frame is a
    * (y, x, value) table, calibration-scoped — load via
    * `FrameSource.toPixels` from predef/flat-field TIFFs (S10). */
  final case class Frames(
      dark: Option[(DataFrame, Double)] = None,
      background: Option[(DataFrame, Double)] = None,
      gainMap: Option[DataFrame] = None,
      flatBkg: Double = 0.0,
      flatField: Option[DataFrame] = None) {
    def isEmpty: Boolean = dark.isEmpty && background.isEmpty &&
      gainMap.isEmpty && flatBkg == 0.0 && flatField.isEmpty
  }

  /** Apply a correction bundle (see [[apply]]). */
  def applyFrames(px: DataFrame, frames: Frames): DataFrame =
    apply(px, frames.dark, frames.background, frames.gainMap,
      frames.flatBkg, frames.flatField)

  /** Build the bundle from a calibration's `.imctrl` correction config
    * ("dark image" / "background image" [path, scale] entries and
    * "Flat Bkg"), loading each configured frame via
    * `FrameSource.loadCorrectionFrame`. */
  def fromCalibration(spark: org.apache.spark.sql.SparkSession,
                      cal: graft.core.Calibration): Frames =
    Frames(
      dark = cal.darkImage.map { case (p, sc) =>
        (graft.sources.FrameSource.loadCorrectionFrame(spark, p), sc) },
      background = cal.backgroundImage.map { case (p, sc) =>
        (graft.sources.FrameSource.loadCorrectionFrame(spark, p), sc) },
      flatBkg = cal.flatBkg)

  /** Apply the correction chain to a pixel table with an `intensity`
    * column. Each correction frame is (y, x, value). Order follows the
    * reference: dark, background, gain (per-mille), flat background,
    * flat field. */
  def apply(px: DataFrame,
            dark: Option[(DataFrame, Double)] = None,
            background: Option[(DataFrame, Double)] = None,
            gainMap: Option[DataFrame] = None,
            flatBkg: Double = 0.0,
            flatField: Option[DataFrame] = None): DataFrame = {
    var out = px.withColumn("corr_i", col("intensity").cast("double"))
    dark.foreach { case (d, scale) =>
      out = out.join(d.select(col("y"), col("x"),
          col("value").as("_dark")), Seq("y", "x"), "left")
        .withColumn("corr_i",
          col("corr_i") + coalesce(col("_dark"), lit(0.0)) * scale)
        .drop("_dark")
    }
    background.foreach { case (b, scale) =>
      out = out.join(b.select(col("y"), col("x"),
          col("value").as("_bkg")), Seq("y", "x"), "left")
        .withColumn("corr_i",
          col("corr_i") + coalesce(col("_bkg"), lit(0.0)) * scale)
        .drop("_bkg")
    }
    gainMap.foreach { g =>
      // reference gain maps are per-mille (divided by 1000)
      out = out.join(g.select(col("y"), col("x"),
          col("value").as("_gain")), Seq("y", "x"), "left")
        .withColumn("corr_i",
          col("corr_i") * coalesce(col("_gain"), lit(1000.0)) / 1000.0)
        .drop("_gain")
    }
    if (flatBkg != 0.0)
      out = out.withColumn("corr_i", col("corr_i") - flatBkg)
    flatField.foreach { f =>
      out = out.join(f.select(col("y"), col("x"),
          col("value").as("_ff")), Seq("y", "x"), "left")
        .withColumn("corr_i",
          col("corr_i") * coalesce(col("_ff"), lit(1.0)))
        .drop("_ff")
    }
    out
  }
}
