package graft.geometry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Calibration

/** The static per-pixel geometry table — the engine's one big "dimension".
  *
  * Reference: per-calibration 2-theta/azimuth/distance/polarization maps and
  * bin-index maps, computed once and cached across frames
  * (Make2ThetaAzimuthMap GSASII_imports.py:515-554, prepare_qmaps
  * cache_creation.py:21-54, Polarization GSASII_imports.py:558-579,
  * CacheCreator pipeline_queue.py:182-343).
  *
  * Spark-first: one closed-form column-math job over `spark.range(ny*nx)`,
  * persisted as Parquet, then broadcast- or bucket-joined to every frame.
  * Nothing here is a UDF — the whole map computation runs inside
  * whole-stage codegen, and at 100 TB the geometry table is written once
  * per calibration hash and reused by every executor.
  *
  * Geometry convention (documented, unit-tested; the reference's exact
  * rotation-composition is vendored GSAS-II code we deliberately re-derive):
  * pixel (x, y) sits at detector-plane offset d = ((x+0.5)*px - cx,
  * (y+0.5)*py - cy) mm; the detector plane is tilted by `tilt` degrees
  * about an axis at `rotation` degrees in the plane; lab-frame position is
  * P = Rz(rot) * Rx(tilt) * Rz(-rot) * (dx, dy, 0) + (0, 0, D);
  * 2theta = angle(P, z), azimuth = atan2(Py, Px) + azmthOff (mod 360).
  */
object Geometry {

  /** Build the geometry DataFrame:
    * (y, x, tth, azim, azim_flipped, q, dist_sq, pol, tth_bin, q_bin,
    *  azim_band, in_tth_range, in_azim_range).
    */
  def build(spark: SparkSession, cal: Calibration): DataFrame = {
    val (ny, nx) = cal.imageSize
    val (pxX, pxY) = (cal.pixelSize._1 / 1000.0, cal.pixelSize._2 / 1000.0)
    val tiltR = math.toRadians(cal.tilt)
    val rotR = math.toRadians(cal.rotation)
    // Precompute the 3x3 pose matrix on the driver (pure scalars).
    // M = Rz(rot) * Rx(tilt) * Rz(-rot)
    val (cr, sr, ct, st) =
      (math.cos(rotR), math.sin(rotR), math.cos(tiltR), math.sin(tiltR))
    val m00 = cr * cr + sr * sr * ct
    val m01 = cr * sr - sr * cr * ct
    val m10 = sr * cr - cr * sr * ct
    val m11 = sr * sr + cr * cr * ct
    val m20 = sr * st
    val m21 = cr * st
    // z-components of the rotated in-plane basis vectors
    val m02 = -sr * st
    val m12 = -cr * st

    val base = spark.range(ny.toLong * nx)
      .select(
        (col("id") / nx).cast("int").as("y"),
        (col("id") % nx).cast("int").as("x"))

    val dx = (col("x") + lit(0.5)) * pxX - cal.center._1
    val dy = (col("y") + lit(0.5)) * pxY - cal.center._2
    val px_ = dx * m00 + dy * m01
    val py_ = dx * m10 + dy * m11
    val pz_ = dx * m20 + dy * m21 + cal.distance
    val r = sqrt(px_ * px_ + py_ * py_ + pz_ * pz_)
    val tth = degrees(acos(pz_ / r))
    val azim = pmod(degrees(atan2(py_, px_)) + cal.azmthOff, lit(360.0))
    val q = lit(4.0 * math.Pi / cal.wavelength) * sin(radians(tth) / 2)
    // Reference stores SQUARED sample distance and the solid-angle
    // correction multiplies by dist^1.5 (pipeline.py:63-65): keep the same
    // contract, normalized by the nominal distance so corrections are O(1).
    val distSq = (r * r) / (cal.distance * cal.distance)
    val polaF = polarization(tth, azim, cal.polaVal)

    val (tthLo, tthHi) = cal.ioTth
    val step = cal.tthStep
    val qEdges = cal.qBinEdges
    val qLo = qEdges.head
    val qStep = (qEdges.last - qEdges.head) / cal.outChannels

    // Radial / azimuthal unit vectors in pixel space (reference
    // r_and_phi_hat cache_creation.py:94-105): r_hat points away from the
    // beam center, phi_hat is its perpendicular; used to project stencil
    // derivatives onto radial/azimuthal directions.
    val rNorm = sqrt(dx * dx + dy * dy)
    val rhatY = when(rNorm > 0, dy / rNorm).otherwise(lit(0.0))
    val rhatX = when(rNorm > 0, dx / rNorm).otherwise(lit(0.0))

    base.select(
      col("y"), col("x"),
      // detector-plane mm coordinates (mask DSL shapes are given in mm)
      ((col("x") + lit(0.5)) * pxX).as("x_mm"),
      ((col("y") + lit(0.5)) * pxY).as("y_mm"),
      tth.as("tth"), azim.as("azim"),
      rhatY.as("rhat_y"), rhatX.as("rhat_x"),
      (-rhatX).as("phat_y"), rhatY.as("phat_x"),
      // second azimuth origin so wedges crossing 0/360 measure correctly
      // (reference flipped-map trick, classification.py:386-393)
      pmod(azim + 180.0, lit(360.0)).as("azim_flipped"),
      q.as("q"), distSq.as("dist_sq"), polaF.as("pol"),
      binOf(tth, tthLo, step, cal.outChannels).as("tth_bin"),
      binOf(q, qLo, qStep, cal.outChannels).as("q_bin"),
      floor(azim / (360.0 / cal.azmBands)).cast("int").as("azim_band"),
      (tth >= tthLo && tth < tthHi).as("in_tth_range"),
      azimIn(azim, cal.lrAzimuth).as("in_azim_range"))
  }

  /** Channel index, -1 for out-of-range (reference clamps to the discard
    * bin, cache_creation.py:40-42). */
  private def binOf(v: Column, lo: Double, step: Double, n: Int): Column = {
    val raw = floor((v - lo) / step).cast("int")
    when(raw >= 0 && raw < n, raw).otherwise(lit(-1))
  }

  /** Wrap-aware azimuth-range predicate (reference pipeline_queue.py:287,
    * mask arcs GSASII_imports.py:147-149). */
  def azimIn(azim: Column, range: (Double, Double)): Column = {
    val (lo, hi) = range
    if (hi - lo >= 360.0) lit(true)
    else if (lo <= hi) azim >= lo && azim <= hi
    else azim >= lo || azim <= hi
  }

  /** Polarization factor (reference Polarization
    * GSASII_imports.py:558-579):
    * ((1-P) cos^2(az) + P sin^2(az)) cos^2(tth) + (1-P) sin^2(az)
    *   + P cos^2(az). */
  def polarization(tth: Column, azim: Column, p: Double): Column = {
    val ca2 = pow(cos(radians(azim)), 2)
    val sa2 = lit(1.0) - ca2
    val ct2 = pow(cos(radians(tth)), 2)
    (lit(1.0 - p) * ca2 + lit(p) * sa2) * ct2 + lit(1.0 - p) * sa2 +
      lit(p) * ca2
  }

  /** Unit conversion columns (reference corrections_and_maps.py:40-49),
    * registered for SQL use as well. */
  def tthToQ(tth: Column, wavelength: Double): Column =
    lit(4.0 * math.Pi / wavelength) * sin(radians(tth) / 2)
  def qToTth(q: Column, wavelength: Double): Column =
    degrees(asin(q * wavelength / (4.0 * math.Pi))) * 2
  def tthToD(tth: Column, wavelength: Double): Column =
    lit(wavelength) / (sin(radians(tth) / 2) * 2)

  /** Persist+reload helper: geometry is content-addressed by calibration so
    * recomputation happens only when the calibration changes (reference
    * invalidates its cache on settings change, pipeline_queue.py:870-871).
    */
  def buildCached(spark: SparkSession, cal: Calibration,
                  cacheDir: String): DataFrame = {
    val key = math.abs(cal.hashCode).toString
    val path = s"$cacheDir/geometry_$key"
    val fs = new java.io.File(path.stripPrefix("file:"))
    if (!fs.exists()) build(spark, cal).write.mode("ignore").parquet(path)
    spark.read.parquet(path)
  }

  /** Persist the geometry table BUCKETED on (y, x): the per-frame
    * pixel ⋈ geometry join (J1 — the hottest join in the engine) then
    * reads the geometry side pre-partitioned, so only the incoming pixel
    * batch shuffles and the geometry side never moves again across the
    * life of a calibration. At 100 TB this converts the dominant join's
    * exchange volume from (pixels + geometry) per batch to (pixels) only.
    */
  def saveBucketed(spark: SparkSession, cal: Calibration, table: String,
                   buckets: Int = 32): Unit = {
    build(spark, cal).write.mode("overwrite")
      .bucketBy(buckets, "y", "x").sortBy("y", "x")
      .format("parquet")
      .saveAsTable(table)
  }
}
