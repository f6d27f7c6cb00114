package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Detector "pseudo-TIFF" dialect decoder (S5).
  *
  * Beamline detectors write TIFF-tagged files whose payload is a raw
  * sample dump that standard TIFF readers cannot interpret — each vendor
  * "almost always incorrectly in some way" (reference GetTifData,
  * GSASII_imports.py:1068-1399). The reference discriminates dialects on
  * a handful of IFD facts (software/description strings, bits-per-sample,
  * first strip offset, image size) and then reads Npix raw samples at a
  * fixed offset with a fixed element type. This object re-derives that
  * behavior from a REAL little/big-endian IFD parser (the reference's
  * parser walks entries with hand-unpacked structs) and a declarative
  * dialect table, so the discrimination facts and payload layouts match
  * while the implementation is independent.
  *
  * All decoding is pure bytes-in/rows-out and runs inside executor tasks
  * (`FrameSource.toPixels`), so a 100 TB frame backlog decodes with full
  * cluster parallelism.
  */
object TiffDialects {

  /** Calibration mined from a detector frame header (MAR-CCD): wavelength
    * in Angstrom, sample-detector distance in mm, beam center in mm —
    * the reference's "extract reasonable X from header" rules
    * (GSASII_imports.py:1170-1182). */
  final case class HeaderCal(wavelength: Option[Double],
                             distance: Option[Double],
                             center: Option[(Double, Double)])

  /** A decoded detector frame: row-major samples, sizes in pixels,
    * pixel pitch in microns (the reference's `pixy`), plus any
    * calibration the frame header itself carries. */
  final case class DetectorFrame(
      tifType: String, nx: Int, ny: Int,
      pixelSizeUm: (Double, Double), samples: Array[Int],
      headerCal: Option[HeaderCal] = None)

  /** Apply header-mined calibration over a base: a standalone MAR dataset
    * (no `.imctrl`/`.poni` present) calibrates from its own frame header,
    * exactly the values the reference feeds into its data dict
    * (GSASII_imports.py:1396). Explicit calibration files still win —
    * callers overlay them after this. */
  def calibrationFrom(frame: DetectorFrame,
                      base: graft.core.Calibration): graft.core.Calibration = {
    val hc = frame.headerCal.getOrElse(
      HeaderCal(None, None, None))
    base.copy(
      wavelength = hc.wavelength.getOrElse(base.wavelength),
      distance = hc.distance.getOrElse(base.distance),
      center = hc.center.getOrElse(base.center),
      pixelSize = frame.pixelSizeUm,
      imageSize = (frame.ny, frame.nx))
  }

  private final case class IfdEntry(tag: Int, typ: Int, count: Int,
                                    values: Array[Long], valOff: Int)

  private final case class Ifd(order: ByteOrder, entries: Map[Int, IfdEntry],
                               nStrips: Int) {
    def first(tag: Int): Option[Long] =
      entries.get(tag).flatMap(_.values.headOption)
    def firstInt(tag: Int, default: Int = 0): Int =
      first(tag).map(_.toInt).getOrElse(default)
    /** ASCII payload of a string tag (empty if absent). `valOff` points at
      * the characters whether they are inline (count <= 4) or remote. */
    def text(tag: Int, bytes: Array[Byte]): String =
      entries.get(tag).map { e =>
        if (e.valOff < 0 || e.valOff + e.count > bytes.length) ""
        else new String(bytes, e.valOff, e.count, "ISO-8859-1")
      }.getOrElse("")
  }

  private def typeSize(t: Int): Int = t match {
    case 1 | 2 | 6 | 7 => 1 // byte/ascii
    case 3 | 8 => 2         // short
    case 4 | 9 | 11 => 4    // long/float
    case 5 | 10 | 12 => 8   // rational/double
    case _ => 1
  }

  /** Parse the first IFD. Returns None unless the II-42 / MM-42 magic
    * checks out (same gate as the reference's "not a detector tiff
    * file"). */
  private def parseIfd(bytes: Array[Byte]): Option[Ifd] = {
    if (bytes.length < 8) return None
    val order =
      if (bytes(0) == 0x49 && bytes(1) == 0x49) ByteOrder.LITTLE_ENDIAN
      else if (bytes(0) == 0x4d && bytes(1) == 0x4d) ByteOrder.BIG_ENDIAN
      else return None
    val bb = ByteBuffer.wrap(bytes).order(order)
    if (bb.getShort(2) != 42) return None
    val ifdOff = bb.getInt(4)
    if (ifdOff < 0 || ifdOff + 2 > bytes.length) return None
    val n = bb.getShort(ifdOff) & 0xffff
    var entries = Map.empty[Int, IfdEntry]
    var nStrips = 1
    var i = 0
    while (i < n) {
      val base = ifdOff + 2 + i * 12
      if (base + 12 > bytes.length) return None
      val tag = bb.getShort(base) & 0xffff
      val typ = bb.getShort(base + 2) & 0xffff
      val count = bb.getInt(base + 4)
      val elem = typeSize(typ)
      val inline = elem.toLong * count <= 4
      val valOff = if (inline) base + 8 else bb.getInt(base + 8)
      def readVal(k: Int): Long = {
        val off = valOff + k * elem
        if (off + elem > bytes.length) 0L
        else typ match {
          case 1 | 6 | 7 => bytes(off) & 0xffL
          case 3 | 8 => bb.getShort(off) & 0xffffL
          case 4 | 9 => bb.getInt(off).toLong & 0xffffffffL
          case 11 => java.lang.Float.floatToIntBits(bb.getFloat(off)).toLong
          case _ => 0L
        }
      }
      val nRead = math.min(count, 8) // discrimination needs first values only
      val vals = Array.tabulate(nRead)(readVal)
      // the reference's nSlice counts LONG-typed strip/byte-count entries
      // only (GSASII_imports.py:1144-1147) — that is its CheMin gate
      if ((tag == 273 || tag == 279) && typ == 4 && count > 1) nStrips = count
      entries += tag -> IfdEntry(tag, typ, count, vals, valOff)
      i += 1
    }
    Some(Ifd(order, entries, nStrips))
  }

  // ---- raw payload readers (offset + element type + byte order) --------

  private def ensure(bytes: Array[Byte], off: Int, len: Long): Boolean =
    off >= 0 && off + len <= bytes.length

  private def readU16(b: Array[Byte], off: Int, n: Int,
                      o: ByteOrder): Option[Array[Int]] =
    if (!ensure(b, off, 2L * n)) None else {
      val bb = ByteBuffer.wrap(b, off, 2 * n).order(o)
      Some(Array.fill(n)(bb.getShort() & 0xffff))
    }

  private def readI16(b: Array[Byte], off: Int, n: Int,
                      o: ByteOrder): Option[Array[Int]] =
    if (!ensure(b, off, 2L * n)) None else {
      val bb = ByteBuffer.wrap(b, off, 2 * n).order(o)
      Some(Array.fill(n)(bb.getShort().toInt))
    }

  private def readI32(b: Array[Byte], off: Int, n: Int,
                      o: ByteOrder): Option[Array[Int]] =
    if (!ensure(b, off, 4L * n)) None else {
      val bb = ByteBuffer.wrap(b, off, 4 * n).order(o)
      Some(Array.fill(n)(bb.getInt()))
    }

  private def readU8(b: Array[Byte], off: Int, n: Int): Option[Array[Int]] =
    if (!ensure(b, off, n.toLong)) None
    else Some(Array.tabulate(n)(k => b(off + k) & 0xff))

  private def readF32(b: Array[Byte], off: Int, n: Int, o: ByteOrder,
                      scale: Double = 1.0): Option[Array[Int]] =
    if (!ensure(b, off, 4L * n)) None else {
      val bb = ByteBuffer.wrap(b, off, 4 * n).order(o)
      Some(Array.fill(n)((bb.getFloat() * scale).toInt))
    }

  // ---- MAR-CCD frame header (public marCCD frame_header struct) --------
  // 1024-byte TIFF header, then the 3072-byte frame header the reference
  // mines via its ReadMarCCDFrame module: goniostat block at header+640
  // (xtal_to_detector, beam_x, beam_y, ... start/end_xtal_to_detector),
  // detector block at +768 (pixelsize nm), X-ray source/optics at +896
  // (wavelengths in femtometers), origin/view_direction flags at +116/+124.

  /** Mined (pixelSizeUm, HeaderCal, flipud, fliplr) from a MAR frame
    * header, with the reference's "reasonable value" fallbacks
    * (GSASII_imports.py:1164-1182). */
  private def marHeader(bytes: Array[Byte], o: ByteOrder)
      : Option[((Double, Double), HeaderCal, Boolean, Boolean)] = {
    if (bytes.length < 4096) return None
    val bb = ByteBuffer.wrap(bytes).order(o)
    def i32(off: Int): Int = bb.getInt(1024 + off)
    val pixX = i32(772); val pixY = i32(776) // nanometers
    val pix = if (pixX > 0 && pixY > 0) (pixX / 1000.0, pixY / 1000.0)
              else (73.242, 73.242) // degenerate header: plate default
    // wavelength: optics wins over source when positive; femtometers -> A.
    // Offsets per the published marCCD frame_header struct: the source
    // block at +896 is ten INT32 fields (source_type..polarization_z,
    // ending at 936), then the 16-byte reserve_source, so the optics
    // block starts at 952 and optics_wavelength is its fourth field, 964.
    val srcWl = i32(908) * 1e-5
    val optWl = i32(964) * 1e-5
    val wl = if (optWl > 0) optWl else srcWl
    // distance: mean of start/end (fields are 1000*mm); a zero end frame
    // falls back to the static xtal_to_detector
    val startXtd = i32(696); val endXtd = i32(728)
    val dAvg = (startXtd + endXtd) * 5e-4
    val d = if (dAvg <= startXtd * 5e-4) i32(640) * 1e-3 else dAvg
    // center: 1000*pixels x nanometers -> mm; zero means unset
    val beamX = i32(644); val beamY = i32(648)
    val center = if (beamX != 0 && beamY != 0)
      Some((beamX.toDouble * pixX * 1e-9, beamY.toDouble * pixY * 1e-9))
    else None
    val cal = HeaderCal(
      wavelength = if (wl > 0) Some(wl) else None,
      distance = if (d > 0) Some(d) else None,
      center = center)
    Some((pix, cal, i32(116) != 0, i32(124) != 0))
  }

  private def flipSamples(s: Array[Int], nx: Int, ny: Int,
                          ud: Boolean, lr: Boolean): Array[Int] =
    if (!ud && !lr) s
    else Array.tabulate(s.length) { k =>
      val y = k / nx; val x = k % nx
      s((if (ud) ny - 1 - y else y) * nx + (if (lr) nx - 1 - x else x))
    }

  /** Decode a detector dialect. `dataType` comes from the `.metadata`
    * sidecar (reference default 5 = PE float32 payload). Returns None for
    * anything that is not a known raw-payload dialect — callers fall back
    * to a standard TIFF decode. */
  def decode(bytes: Array[Byte], dataType: Int = 5): Option[DetectorFrame] = {
    val ifd = parseIfd(bytes).getOrElse(return None)
    val nx = ifd.firstInt(256); val ny = ifd.firstInt(257)
    if (nx <= 0 || ny <= 0) return None
    val npix = nx * ny
    val bits = ifd.firstInt(258)
    val strip = ifd.firstInt(273)
    val o = ifd.order
    val le = ByteOrder.LITTLE_ENDIAN

    // MAR-CCD (tag 34710): uint16 samples at 4096 behind the marCCD frame
    // header, which carries its own calibration — mined here like the
    // reference's ReadMarCCDFrame path (GSASII_imports.py:1159-1182),
    // including the origin/view-direction flips. A standalone MAR dataset
    // therefore calibrates with no .imctrl present ([[calibrationFrom]]).
    if (ifd.entries.contains(34710)) {
      val (pix, cal, ud, lr) = marHeader(bytes, o).getOrElse(
        ((73.242, 73.242), HeaderCal(None, None, None), false, false))
      return readU16(bytes, 4096, npix, o).map(s =>
        DetectorFrame("MAR CCD", nx, ny, pix,
          flipSamples(s, nx, ny, ud, lr), Some(cal)))
    }

    // CheMin multislice (reference GSASII_imports.py:1184-1201: any TIFF
    // whose strip table is multiple LONG entries): PIL reads the first
    // slice; intensities scale x10, the image flips vertically, and the
    // camera constants are fixed — 40 um pitch, 18 mm distance,
    // 1.78892 A (Co Ka), beam center at (pix * nx / 2000, 0) mm. The
    // standard-TIFF decode runs through javax.imageio here (the slice is
    // a plain strip TIFF), where the reference needs PIL.
    if (ifd.nStrips > 1) {
      return scala.util.Try(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes)))
        .toOption.filter(_ != null).map { img =>
          val r = img.getRaster
          val iw = r.getWidth; val ih = r.getHeight
          val samples = new Array[Int](iw * ih)
          val row = new Array[Int](iw)
          var yy = 0
          while (yy < ih) {
            r.getSamples(0, yy, iw, 1, 0, row)
            var xx = 0
            while (xx < iw) {
              samples((ih - 1 - yy) * iw + xx) = row(xx) * 10
              xx += 1
            }
            yy += 1
          }
          DetectorFrame("CheMin", iw, ih, (40.0, 40.0), samples,
            Some(HeaderCal(Some(1.78892), Some(18.0),
              Some((40.0 * iw / 2000.0, 0.0)))))
        }
    }

    // Dialect table — same discrimination order as the reference
    // (GSASII_imports.py:1160-1362).
    val decoded: Option[(String, (Double, Double), Option[Array[Int]])] =
      if (ifd.entries.contains(272)) {
        val sw = ifd.text(272, bytes)
        if (sw.contains("PILATUS"))
          Some(("Pilatus", (172.0, 172.0), readI32(bytes, 4096, npix, le)))
        else if (bits == 16) {
          val (name, pix) =
            if ((nx, ny) == (3888, 3072) || (nx, ny) == (3072, 3888))
              ("Dexela", (74.8, 74.8)) else ("GE", (200.0, 200.0))
          Some((name, pix, readU16(bytes, 8, npix, le)))
        } else if (bits == 32)
          Some(("CHESS", (200.0, 200.0), readI32(bytes, 8, npix, le)))
        else None
      } else if (ifd.entries.contains(270)) {
        val desc = ifd.text(270, bytes)
        if (desc.contains("Pilatus3"))
          Some(("Pilatus3", (172.0, 172.0), readI32(bytes, strip, npix, le)))
        else if (desc.contains("ImageJ")) {
          if (bits == 32)
            Some(("ImageJ", (200.0, 200.0), readI32(bytes, strip, npix, o)))
          else if (bits == 16)
            Some(("ImageJ", (109.92, 109.92), readU16(bytes, strip, npix, o)))
          else None
        } else // gain map (11-ID-C): float32 x 1000
          Some(("Gain map", (200.0, 200.0),
            readF32(bytes, strip, npix, o, scale = 1000.0)))
      } else if (ifd.firstInt(262) > 4)
        Some(("DND", (158.0, 158.0), readU16(bytes, 512, npix, le)))
      else if ((nx, ny) == (1536, 1536))
        Some(("APS Gold", (150.0, 150.0), readU16(bytes, 64, npix, le)))
      else if (nx == ny && Set(2048, 1024, 3072).contains(nx)) {
        if (strip == 8) {
          if (bits == 32)
            Some(("PE", (200.0, 200.0),
              if (dataType == 5) readF32(bytes, 8, npix, le)
              else readI32(bytes, 8, npix, le)))
          else if (bits == 16)
            Some(("MedOptics D1", (46.9, 46.9), readU16(bytes, 8, npix, le)))
          else None
        } else if (strip == 4096) {
          val (name, pix) = if (nx == 3072) ("MAR225", (73.0, 73.0))
            else ("MAR325", (158.0, 158.0))
          Some((name, pix, readU16(bytes, 4096, npix, le)))
        } else if (strip == 512)
          Some(("11-ID-C", (200.0, 200.0), readU16(bytes, 512, npix, le)))
        else None
      } else if ((nx, ny) == (4096, 4096)) {
        if (strip == 8) {
          if (bits == 16)
            Some(("scanCCD", (9.0, 9.0), readU16(bytes, 8, npix, le)))
          else if (bits == 32) // PE 4k: float32 / 2^4
            Some(("PE4k", (100.0, 100.0),
              readF32(bytes, 8, npix, le, scale = 1.0 / 16.0)))
          else None
        } else if (strip == 4096)
          Some(("Rayonix", (73.242, 73.242), readU16(bytes, 4096, npix, le)))
        else None
      } else (nx, ny) match {
        case (391, 380) =>
          Some(("int16", (109.92, 109.92), readI16(bytes, 8, npix, le)))
        case (380, 391) =>
          Some(("uint8", (109.92, 109.92), readU8(bytes, 110, npix)))
        case (825, 830) =>
          Some(("uint8", (109.92, 109.92), readU8(bytes, 8, npix)))
        case (1800, 1800) =>
          Some(("uint8", (109.92, 109.92), readU8(bytes, 110, npix)))
        case (2880, 2880) =>
          Some(("float32", (150.0, 150.0), readF32(bytes, 8, npix, o)))
        case (3070, 1102) => // Dectris Eiger 1M: uint32 payload
          Some(("Eiger 1M", (75.0, 75.0), readI32(bytes, 8, npix, le)))
        case (1024, 402) =>
          Some(("uint16", (56.0, 56.0), readU16(bytes, 8, npix, le)))
        case _ => None
      }

    decoded.flatMap { case (name, pix, samplesOpt) =>
      samplesOpt.map(s => DetectorFrame(name, nx, ny, pix, s))
    }
  }

  /** Decode with a `.metadata` sidecar (reference GSASII_imports.py:
    * 1086-1111): `dataType=` selects the PE float/int payload variant.
    * Pixel-size precedence matches GetTifData exactly: the DIALECT's
    * pitch wins; `detectorXPixelSize`/`detectorYPixelSize` are a fallback
    * applied only when no dialect set one (`if pixy is None: pixy =
    * pixy_meta`, GSASII_imports.py:1389-1395) — and every successfully
    * decoded dialect sets one, so the sidecar pitch never overrides a
    * decoded frame. */
  def decodeWithSidecar(bytes: Array[Byte],
                        sidecar: Iterator[String]): Option[DetectorFrame] = {
    val kv = sidecar.flatMap { ln =>
      ln.split("=", 2) match {
        case Array(k, v) => Some(k.trim.toLowerCase -> v.trim)
        case _ => None
      }
    }.toMap
    val dataType = kv.get("datatype").flatMap(_.toIntOption).getOrElse(5)
    decode(bytes, dataType)
  }
}
