package graft.queries

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The results-UI's standing queries as library queries over the sink
  * tables (reference mainUI modules: polling + incremental file parsing,
  * SURVEY §3.3). Each is a plain DataFrame expression — run once, or as a
  * streaming query over the parquet sinks.
  */
object UiQueries {

  /** Contour/waterfall matrix (reference mainUI/contour.py:170-295):
    * stride-sampled frames x 2-theta channels of one integral variant.
    * The stride doubles until at most `maxLines` frames remain
    * (reference :208-215). */
  def contour(integrals: DataFrame, variant: String,
              maxLines: Int = 100): DataFrame = {
    val frames = integrals.select(col("dataset"), col("frame_no"))
      .distinct()
    val counts = frames.groupBy(col("dataset"))
      .agg(count(lit(1)).as("n_frames"))
      .withColumn("stride",
        greatest(lit(1), ceil(col("n_frames") / maxLines)).cast("int"))
    val w = Window.partitionBy(col("dataset")).orderBy(col("frame_no"))
    val sampled = frames
      .withColumn("rn", row_number().over(w))
      .join(broadcast(counts), "dataset")
      .where((col("rn") - 1) % col("stride") === 0)
      .select(col("dataset"), col("frame_no"))
    integrals.join(sampled, Seq("dataset", "frame_no"))
      .select(col("dataset"), col("frame_no"), col("tth_bin"), col("tth"),
        col(s"i_$variant").as("intensity"))
  }

  /** Integral difference curves (reference mainUI/integrals.py:280-287):
    * base − masked variants per channel. */
  def integralDiffs(integrals: DataFrame): DataFrame =
    integrals.select(col("dataset"), col("frame_no"), col("tth_bin"),
      col("tth"),
      (col("i_base") - col("i_om")).as("diff_om"),
      (col("i_base") - col("i_spotsmasked")).as("diff_spots"),
      (col("i_base") - col("i_arcsmasked")).as("diff_arcs"))

  /** Per-Q-bin derived gradient stats (reference mainUI/spottiness.py:
    * 85-114: mad − std and std/mad columns; negative Qbins dropped
    * :99-100). */
  def gradDerived(gradStats: DataFrame): DataFrame =
    gradStats.where(col("Qbin") >= 0)
      .withColumn("mad_minus_std", col("mad") - col("std"))
      .withColumn("std_over_mad",
        when(col("mad") =!= 0, col("std") / col("mad")))

  /** Spot-count histogram over Q bins (reference mainUI/stats.py:115-117),
    * background label dropped. */
  def spotHistogram(spotStats: DataFrame): DataFrame =
    spotStats.where(col("spot_stat_label") >= 0)
      .groupBy(col("dataset"), col("Qbin"))
      .agg(count(lit(1)).as("n_spots"))

  /** Frames whose processing completed (reference
    * mainUI/main_window.py:348-366: tif list ⋈ integral list) — a
    * left-semi join. */
  def completedFrames(allFrames: DataFrame, integrals: DataFrame): DataFrame =
    allFrames.join(integrals.select(col("dataset"), col("frame_no"))
      .distinct(), Seq("dataset", "frame_no"), "left_semi")
}
