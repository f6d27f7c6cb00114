package graft.stencil

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational binary morphology over SPARSE pixel sets.
  *
  * The reference applies scikit-image `binary_closing` (3x3) to the outlier
  * mask (pipeline.py:191-205) and `binary_dilation` (7x7) to the predefined
  * mask (pipeline.py:160-162). Those masks are sparse (outliers are a tiny
  * fraction of the frame), so in Spark we represent a mask as the ROW SET of
  * active pixels and morphology becomes relational algebra:
  *
  *  - dilation  = explode each active pixel to its neighbourhood, distinct;
  *  - erosion   = an active-or-dilated pixel survives iff its whole
  *    neighbourhood is active = groupBy(neighbour target).count == k^2;
  *  - closing   = erode(dilate(m)) with out-of-frame treated as inactive
  *    (documented convention; scipy's border_value=0).
  *
  * Row explosion is bounded by k^2 * |active| — for sparse masks this beats
  * any dense-stencil exchange, shuffles only mask-sized data, and scales
  * linearly with active pixels regardless of frame size. Dense stencils
  * (gradient convolutions) use [[Stencil.convolve2d]] instead.
  *
  * All inputs/outputs are DataFrames with (keyCols..., y, x) — one row per
  * ACTIVE pixel.
  */
object Morphology {

  private def offsets(r: Int): Seq[(Int, Int)] =
    for { dy <- -r to r; dx <- -r to r } yield (dy, dx)

  /** Square dilation of radius r ((2r+1)x(2r+1) structuring element). */
  def dilate(active: DataFrame, r: Int, keys: Seq[String],
             width: Int, height: Int): DataFrame = {
    val off = offsets(r)
    val offCol = explode(array(off.map { case (dy, dx) =>
      struct(lit(dy).as("dy"), lit(dx).as("dx")) }: _*))
    active.select(keys.map(col) :+ offCol.as("o") :+ col("y") :+ col("x"): _*)
      .select(keys.map(col) :+
        (col("y") + col("o.dy")).as("y") :+
        (col("x") + col("o.dx")).as("x"): _*)
      .where(col("y") >= 0 && col("y") < height &&
        col("x") >= 0 && col("x") < width)
      .distinct()
  }

  /** Square erosion of radius r: a pixel survives iff all (2r+1)^2
    * neighbours are active (out-of-frame counts as inactive). */
  def erode(active: DataFrame, r: Int, keys: Seq[String],
            width: Int, height: Int): DataFrame = {
    val k2 = (2 * r + 1) * (2 * r + 1)
    val off = offsets(r)
    val offCol = explode(array(off.map { case (dy, dx) =>
      struct(lit(dy).as("dy"), lit(dx).as("dx")) }: _*))
    // each active pixel votes for the positions whose neighbourhood it is in
    active.select(keys.map(col) :+ offCol.as("o") :+ col("y") :+ col("x"): _*)
      .select(keys.map(col) :+
        (col("y") + col("o.dy")).as("y") :+
        (col("x") + col("o.dx")).as("x"): _*)
      .groupBy(keys.map(col) :+ col("y") :+ col("x"): _*)
      .agg(count(lit(1)).as("votes"))
      .where(col("votes") === k2 &&
        col("y") >= 0 && col("y") < height &&
        col("x") >= 0 && col("x") < width)
      .drop("votes")
  }

  /** Binary closing: fill holes smaller than the structuring element
    * (reference pipeline.py:191-205, 3x3 => r=1). */
  def closing(active: DataFrame, r: Int, keys: Seq[String],
              width: Int, height: Int): DataFrame =
    erode(dilate(active, r, keys, width, height), r, keys, width, height)
}
