package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic detector frames with planted powder rings, hot
  * spots and dead pixels — the engine's ground-truth fixture generator
  * (SURVEY §5 strategy 5: planted rings + spots with analytic truth).
  *
  * Entirely column math over `spark.range`, so frames of any size are
  * generated distributed, never materialized on the driver. "Noise" is a
  * hash of the pixel id — deterministic across runs and engines.
  */
object SyntheticFrame {

  /** One frame: rows (frame_no, y, x, intensity). Rings are Gaussian radial
    * profiles centred at the given 2-theta values; spots are Gaussian
    * bumps at fixed pixel positions; a sprinkle of hash-chosen pixels is
    * "hot" (large positive) to exercise the outlier mask. */
  def frame(spark: SparkSession, cal: Calibration, frameNo: Int,
            ringTths: Seq[Double] = Seq(3.0, 5.5, 8.0, 11.0),
            ringAmp: Double = 800.0, ringSigmaDeg: Double = 0.08,
            nHotPer10k: Int = 3,
            spots: Seq[(Int, Int, Double, Double)] = Nil,
            arcs: Seq[(Double, Double, Double, Double)] = Nil): DataFrame = {
    val geo = graft.geometry.Geometry.build(spark, cal)
    val ringSignal = ringTths.map { t =>
      lit(ringAmp) * exp(-pow((col("tth") - t) / ringSigmaDeg, 2))
    }.reduce(_ + _)
    // planted Gaussian spots (y0, x0, amplitude, sigma_px) — multi-pixel
    // clusters for the CCL/classification ground truth
    val spotSignal = spots.map { case (y0, x0, amp, sig) =>
      lit(amp) * exp(-(pow(col("y") - y0, 2) + pow(col("x") - x0, 2)) /
        (2.0 * sig * sig))
    }.foldLeft(lit(0.0): org.apache.spark.sql.Column)(_ + _)
    // planted texture arcs (tth0, azimLo, azimHi, amplitude): a bright
    // wedge of a ring — radially thin, azimuthally long
    val arcSignal = arcs.map { case (t0, aLo, aHi, amp) =>
      when(col("azim") >= aLo && col("azim") <= aHi,
        lit(amp) * exp(-pow((col("tth") - t0) / ringSigmaDeg, 2)))
        .otherwise(lit(0.0))
    }.foldLeft(lit(0.0): org.apache.spark.sql.Column)(_ + _)
    val pixId = col("y").cast("long") * cal.imageSize._2 + col("x")
    val noise = pmod(xxhash64(pixId, lit(frameNo)), lit(100L)).cast("double")
    val hot = when(
      pmod(xxhash64(pixId + 7, lit(frameNo)), lit(10000L)) < nHotPer10k,
      lit(50000.0)).otherwise(lit(0.0))
    val dead = when(pmod(xxhash64(pixId + 13), lit(10000L)) < 2,
      lit(true)).otherwise(lit(false))
    geo.select(
      lit(frameNo).as("frame_no"), col("y"), col("x"),
      when(dead, lit(0))
        .otherwise((lit(100.0) + ringSignal + spotSignal + arcSignal +
          noise + hot).cast("int"))
        .as("intensity"))
  }

  /** A small test calibration producing an n x n frame whose 2-theta range
    * covers the default integration window. */
  def testCalibration(n: Int = 256): Calibration = Calibration(
    imageSize = (n, n),
    center = (n * 0.15 / 2, n * 0.15 / 2), // mm; pixel 150um
    distance = 80.0,
    ioTth = (1.0, 12.7),
    outChannels = 500,
    azmBands = 72)
}
