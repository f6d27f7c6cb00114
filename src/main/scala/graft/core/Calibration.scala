package graft.core

/** Detector calibration ("Image Controls" in the reference). Broadcast to
  * executors as a plain case class; all geometry is derived from it.
  *
  * Field semantics follow the reference's calibration schema
  * (GSASII_imports.py:88-166 seeds defaults; LoadControls
  * GSASII_imports.py:170-230 whitelists overrides) without copying code:
  *  - wavelength: X-ray wavelength, Angstrom
  *  - distance: sample-detector distance along the beam, mm
  *  - center: beam center on the detector, mm (x, y)
  *  - tilt: detector tilt angle, degrees
  *  - rotation: tilt-plane rotation, degrees
  *  - pixelSize: pixel pitch, micron (x, y)
  *  - ioTth: integration 2-theta range [min, max], degrees
  *  - lrAzimuth: azimuth range [min, max], degrees
  *  - outChannels: number of 2-theta integration channels
  *  - polaVal: polarization fraction
  *  - azmBands: number of azimuth bands (reference default 360,
  *    pipeline_queue.py:298)
  */
final case class Calibration(
    wavelength: Double = 0.24087,
    distance: Double = 689.55,
    center: (Double, Double) = (214.787, 216.551),
    tilt: Double = 0.0,
    rotation: Double = 0.0,
    pixelSize: (Double, Double) = (150.0, 150.0),
    ioTth: (Double, Double) = (1.0, 12.7),
    lrAzimuth: (Double, Double) = (0.0, 360.0),
    outChannels: Int = 2500,
    polaVal: Double = 0.99,
    detDepth: Double = 0.0,
    azmthOff: Double = 0.0,
    azmBands: Int = 360,
    imageSize: (Int, Int) = (2880, 2880),
    // correction config carried from .imctrl (reference LoadControls
    // keys "Flat Bkg", "dark image", "background image" — each image
    // entry is [path, scale]; consumed via Corrections.Frames)
    flatBkg: Double = 0.0,
    darkImage: Option[(String, Double)] = None,
    backgroundImage: Option[(String, Double)] = None) {

  /** Width of one 2-theta channel in degrees. */
  def tthStep: Double = (ioTth._2 - ioTth._1) / outChannels

  /** q = 4 pi sin(tth/2) / lambda at a given 2-theta (degrees)
    * (reference corrections_and_maps.py:65-66). */
  def tthToQ(tth: Double): Double =
    4.0 * math.Pi * math.sin(math.toRadians(tth) / 2.0) / wavelength

  /** Inverse of [[tthToQ]] (reference corrections_and_maps.py:44-45). */
  def qToTth(q: Double): Double =
    2.0 * math.toDegrees(math.asin(q * wavelength / (4.0 * math.Pi)))

  /** d-spacing at 2-theta (Bragg; reference corrections_and_maps.py:48-49).
    */
  def tthToD(tth: Double): Double =
    wavelength / (2.0 * math.sin(math.toRadians(tth) / 2.0))

  /** Q-band edges: outChannels+1 edges spanning [q(tthMin), q(tthMax)]
    * (reference corrections_and_maps.py:52-62). */
  def qBinEdges: Array[Double] = {
    val qmin = tthToQ(ioTth._1); val qmax = tthToQ(ioTth._2)
    val step = (qmax - qmin) / outChannels
    Array.tabulate(outChannels + 1)(i => qmin + i * step)
  }
}

object Calibration {

  /** Parse a GSAS-II `.imctrl` file body: `key:value` lines with Python
    * literals, whitelisted keys (reference LoadControls
    * GSASII_imports.py:170-230). Unknown keys ignored. */
  def fromImctrl(lines: Iterator[String]): Calibration = {
    val kv = lines.flatMap { ln =>
      ln.split(":", 2) match {
        case Array(k, v) => Some(k.trim -> v.trim)
        case _ => None
      }
    }.toMap
    def num(k: String, d: Double) = kv.get(k).map(_.toDouble).getOrElse(d)
    def pair(k: String, d: (Double, Double)) = kv.get(k).map(parsePair).getOrElse(d)
    val base = Calibration()
    base.copy(
      wavelength = num("wavelength", base.wavelength),
      distance = num("distance", base.distance),
      center = pair("center", base.center),
      tilt = num("tilt", base.tilt),
      rotation = num("rotation", base.rotation),
      pixelSize = pair("pixelSize", base.pixelSize),
      ioTth = pair("IOtth", base.ioTth),
      lrAzimuth =
        if (kv.get("fullIntegrate").exists(_.trim.equalsIgnoreCase("True")))
          (0.0, 360.0)
        else pair("LRazimuth", base.lrAzimuth),
      outChannels = num("outChannels", base.outChannels).toInt,
      // PolaVal is "[fraction, refine-flag]" — only the fraction is numeric
      polaVal = kv.get("PolaVal")
        .map(_.replaceAll("[\\[\\]()]", "").split(",").head.trim.toDouble)
        .getOrElse(base.polaVal),
      detDepth = num("DetDepth", base.detDepth),
      azmthOff = num("azmthOff", base.azmthOff),
      flatBkg = num("Flat Bkg", base.flatBkg),
      darkImage = imgEntry(kv, "dark image"),
      backgroundImage = imgEntry(kv, "background image"))
  }

  /** "['/path/to.tif', scale]" / "[, 1.0]" → Some((path, scale)); empty
    * path means no frame configured (reference stores a 2-list). */
  private def imgEntry(kv: Map[String, String],
                       key: String): Option[(String, Double)] =
    kv.get(key).flatMap { v =>
      val parts = v.replaceAll("[\\[\\]']", "").split(",").map(_.trim)
      if (parts.length >= 2 && parts(0).nonEmpty)
        parts(1).toDoubleOption.map(sc => (parts(0), sc))
      else None
    }

  /** Parse a pyFAI `.poni` file and convert to the GSAS-II-style schema
    * (reference LoadControlsPONI/poni_to_gsasii GSASII_imports.py:234-330).
    * PONI distances are meters, wavelength meters; the GSAS-II schema wants
    * mm and Angstrom. PONI carries no integration config, so ioTth /
    * outChannels keep defaults. The tilt/rotation composition: pyFAI's
    * rot1/rot2 tilt the detector about the two in-plane axes; the combined
    * tilt magnitude is acos(cos(rot1)cos(rot2)) and the tilt-plane azimuth
    * follows from the rotation order (standard published conversion). */
  def fromPoni(lines: Iterator[String]): Calibration = {
    val kv = lines.flatMap { ln =>
      ln.split(":", 2) match {
        case Array(k, v) => Some(k.trim.toLowerCase -> v.trim)
        case _ => None
      }
    }.toMap
    def num(k: String, d: Double) = kv.get(k).map(_.toDouble).getOrElse(d)
    val base = Calibration()
    val distM = num("distance", base.distance / 1000.0)
    val rot1 = num("rot1", 0.0); val rot2 = num("rot2", 0.0)
    val poni1 = num("poni1", 0.0); val poni2 = num("poni2", 0.0)
    val wlM = num("wavelength", base.wavelength * 1e-10)
    val tilt = math.toDegrees(
      math.acos(math.cos(rot1) * math.cos(rot2)))
    val rotation =
      if (tilt == 0.0) 0.0
      else math.toDegrees(math.atan2(-math.sin(rot2),
        -math.cos(rot2) * math.sin(rot1)))
    // beam center in mm on the detector face; PONI origin is the detector
    // corner, poni1=y (meters), poni2=x (meters), corrected for the
    // tilt-induced offset at small angles.
    val cx = (poni2 + distM * math.tan(rot1)) * 1000.0
    val cy = (poni1 - distM * math.tan(rot2)) * 1000.0
    base.copy(
      wavelength = wlM * 1e10,
      distance = distM * 1000.0 / (math.cos(rot1) * math.cos(rot2)),
      center = (cx, cy),
      tilt = tilt,
      rotation = ((rotation % 360) + 360) % 360)
  }

  /** Parse a `.metadata` sidecar: `key=value` lines (reference
    * GSASII_imports.py:1086-1111). Returns overrides applied to `base`. */
  def withMetadata(base: Calibration, lines: Iterator[String]): Calibration = {
    val kv = lines.flatMap { ln =>
      ln.split("=", 2) match {
        case Array(k, v) => Some(k.trim.toLowerCase -> v.trim)
        case _ => None
      }
    }.toMap
    def num(k: String, d: Double) = kv.get(k).map(_.toDouble).getOrElse(d)
    base.copy(
      wavelength = num("wavelength", base.wavelength),
      distance = num("distance", base.distance),
      polaVal = num("polarization", base.polaVal),
      pixelSize = (num("detectorxpixelsize", base.pixelSize._1),
        num("detectorypixelsize", base.pixelSize._2)))
  }

  /** "[a, b]" / "(a, b)" / "a,b" → (a, b). */
  private def parsePair(s: String): (Double, Double) = {
    val parts = s.replaceAll("[\\[\\]()]", "").split(",").map(_.trim.toDouble)
    (parts(0), parts(1))
  }
}
