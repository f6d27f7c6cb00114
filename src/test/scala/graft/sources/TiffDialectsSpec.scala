package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite

/** Per-dialect fixtures built from the layout facts in the reference's
  * GetTifData (GSASII_imports.py:1068-1399): a real IFD + a raw payload
  * at the dialect's offset/element-type, round-tripped through
  * [[TiffDialects.decode]]. */
class TiffDialectsSpec extends AnyFunSuite {

  /** Minimal TIFF writer for fixtures: header, payload at `payloadOff`,
    * optional ASCII tag text, IFD at the end. */
  private def buildTiff(le: Boolean, nx: Int, ny: Int, bits: Int,
                        payloadOff: Int, payload: Array[Byte],
                        stringTag: Option[(Int, String)] = None,
                        stripOff: Option[Int] = None,
                        extraTags: Seq[(Int, Int, Long)] = Nil)
      : Array[Byte] = {
    val order = if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val strBytes = stringTag.map(_._2.getBytes("ISO-8859-1"))
      .getOrElse(Array.empty[Byte])
    val strOff = payloadOff + payload.length
    val ifdOff = strOff + strBytes.length + (strBytes.length % 2)
    // entries: tag -> (type, count, value) ; value either inline or offset
    var tags = List(
      (256, 3, 1, nx.toLong), (257, 3, 1, ny.toLong),
      (258, 3, 1, bits.toLong))
    stripOff.foreach(o => tags ::= ((273, 4, 1, o.toLong)))
    stringTag.foreach { case (t, s) => tags ::= ((t, 2, s.length, strOff.toLong)) }
    extraTags.foreach { case (t, typ, v) => tags ::= ((t, typ, 1, v)) }
    val entries = tags.sortBy(_._1)
    val total = ifdOff + 2 + entries.length * 12 + 4
    val bb = ByteBuffer.allocate(total).order(order)
    bb.put(0, (if (le) 0x49 else 0x4d).toByte)
    bb.put(1, (if (le) 0x49 else 0x4d).toByte)
    bb.putShort(2, 42.toShort)
    bb.putInt(4, ifdOff)
    System.arraycopy(payload, 0, bb.array(), payloadOff, payload.length)
    System.arraycopy(strBytes, 0, bb.array(), strOff, strBytes.length)
    bb.putShort(ifdOff, entries.length.toShort)
    entries.zipWithIndex.foreach { case ((tag, typ, count, value), i) =>
      val base = ifdOff + 2 + i * 12
      bb.putShort(base, tag.toShort)
      bb.putShort(base + 2, typ.toShort)
      bb.putInt(base + 4, count)
      typ match {
        case 3 if count == 1 => bb.putShort(base + 8, value.toShort)
        case _ => bb.putInt(base + 8, value.toInt)
      }
    }
    bb.array()
  }

  private val nx = 4; private val ny = 3
  private val vals = Array(0, 1, 77, 40000, 65535, 12, 7, 3, 900, 2, 5, 8)

  private def u16le(v: Seq[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(2 * v.length).order(ByteOrder.LITTLE_ENDIAN)
    v.foreach(x => bb.putShort(x.toShort)); bb.array()
  }
  private def i32(v: Seq[Int], le: Boolean = true): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * v.length)
      .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    v.foreach(bb.putInt); bb.array()
  }
  private def f32le(v: Seq[Float]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * v.length).order(ByteOrder.LITTLE_ENDIAN)
    v.foreach(bb.putFloat); bb.array()
  }

  private def check(bytes: Array[Byte], expectType: String,
                    expectPix: (Double, Double), expect: Seq[Int],
                    dataType: Int = 5): Unit = {
    val f = TiffDialects.decode(bytes, dataType)
      .getOrElse(fail(s"$expectType fixture not decoded"))
    assert(f.tifType == expectType)
    assert(f.pixelSizeUm == expectPix)
    assert(f.nx == nx && f.ny == ny)
    assert(f.samples.toSeq == expect)
  }

  test("Pilatus: software tag + int32 LE at 4096 (negative gap pixels)") {
    val px = vals.map(v => v - 2) // Pilatus uses -1/-2 for gaps
    check(buildTiff(le = true, nx, ny, 32, 4096, i32(px.toIndexedSeq),
      stringTag = Some((272, "PILATUS 300K detector"))),
      "Pilatus", (172.0, 172.0), px.toIndexedSeq)
  }

  test("GE: model tag + uint16 LE at 8") {
    check(buildTiff(le = true, nx, ny, 16, 8, u16le(vals.toIndexedSeq),
      stringTag = Some((272, "GE Detector Rev 2"))),
      "GE", (200.0, 200.0), vals.toIndexedSeq)
  }

  test("CHESS: model tag + 32-bit at 8") {
    check(buildTiff(le = true, nx, ny, 32, 8, i32(vals.toIndexedSeq),
      stringTag = Some((272, "AreaDetector unknown"))),
      "CHESS", (200.0, 200.0), vals.toIndexedSeq)
  }

  test("Pilatus3: description tag + int32 at strip offset") {
    check(buildTiff(le = true, nx, ny, 32, 256, i32(vals.toIndexedSeq),
      stringTag = Some((270, "Pilatus3 1M camsetup")),
      stripOff = Some(256)),
      "Pilatus3", (172.0, 172.0), vals.toIndexedSeq)
  }

  test("ImageJ big-endian uint16 honors byte order and strip offset") {
    val bb = ByteBuffer.allocate(2 * vals.length).order(ByteOrder.BIG_ENDIAN)
    vals.foreach(v => bb.putShort(v.toShort))
    check(buildTiff(le = false, nx, ny, 16, 64, bb.array(),
      stringTag = Some((270, "ImageJ=1.52")),
      stripOff = Some(64)),
      "ImageJ", (109.92, 109.92), vals.toIndexedSeq)
  }

  test("DND: photometric > 4 + uint16 at 512") {
    check(buildTiff(le = true, nx, ny, 16, 512, u16le(vals.toIndexedSeq),
      extraTags = Seq((262, 3, 5L))),
      "DND", (158.0, 158.0), vals.toIndexedSeq)
  }

  test("PE: 1024x1024 + strip 8 + 32-bit: float32 payload (dataType 5) " +
      "vs int32 (dataType 0)") {
    val n = 1024
    val fvals = Array.tabulate(n * n)(i => (i % 1000).toFloat)
    val bytesF = buildTiff(le = true, n, n, 32, 8, f32le(fvals.toIndexedSeq),
      stripOff = Some(8))
    val f = TiffDialects.decode(bytesF, dataType = 5).get
    assert(f.tifType == "PE" && f.pixelSizeUm == ((200.0, 200.0)))
    assert(f.samples.take(1000).toSeq == (0 until 1000))
    val ivals = Array.tabulate(n * n)(i => i % 997)
    val bytesI = buildTiff(le = true, n, n, 32, 8, i32(ivals.toIndexedSeq),
      stripOff = Some(8))
    val g = TiffDialects.decode(bytesI, dataType = 0).get
    assert(g.tifType == "PE" && g.samples.take(997).toSeq == (0 until 997))
  }

  test("APS Gold: 1536x1536 uint16 at 64") {
    val n = 1536
    val pv = Array.tabulate(n * n)(i => i % 60000)
    val bytes = buildTiff(le = true, n, n, 16, 64, u16le(pv.toIndexedSeq))
    val f = TiffDialects.decode(bytes).get
    assert(f.tifType == "APS Gold" && f.pixelSizeUm == ((150.0, 150.0)))
    assert(f.samples(123456) == 123456 % 60000)
  }

  test("baseline TIFF (ImageIO-encoded) is NOT claimed by a dialect") {
    val m = Array.tabulate(8, 8)((y, x) => y * 10 + x)
    assert(TiffDialects.decode(FrameSource.encodeTiff(m)).isEmpty)
    // but decodeTiff still reads it via the imageio fallback
    val rows = FrameSource.decodeTiff(FrameSource.encodeTiff(m)).toSeq
    assert(rows.size == 64 && rows.forall { case (y, x, v) => v == y * 10 + x })
  }

  test("sidecar dataType selects PE int32 path; dialect pitch wins over " +
      "sidecar pixel sizes (GetTifData precedence)") {
    val n = 1024
    val ivals = Array.tabulate(n * n)(i => i % 997)
    val bytes = buildTiff(le = true, n, n, 32, 8, i32(ivals.toIndexedSeq),
      stripOff = Some(8))
    val sidecar = Seq("dataType=0", "detectorXPixelSize=123.4",
      "detectorYPixelSize=56.7")
    val f = TiffDialects.decodeWithSidecar(bytes, sidecar.iterator).get
    assert(f.tifType == "PE")
    // reference: sidecar pitch applies ONLY when the dialect set none
    // (GSASII_imports.py:1389-1395); PE sets 200
    assert(f.pixelSizeUm == ((200.0, 200.0)))
    assert(f.samples.take(5).toSeq == Seq(0, 1, 2, 3, 4))
  }

  /** Write MAR frame-header ints (offset relative to the header at 1024)
    * into a fixture. */
  private def withMarHeader(bytes: Array[Byte],
                            fields: Seq[(Int, Int)]): Array[Byte] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    fields.foreach { case (off, v) => bb.putInt(1024 + off, v) }
    bytes
  }

  test("MAR CCD: tag 34710 + uint16 at 4096, degenerate header falls " +
      "back to plate defaults") {
    check(buildTiff(le = true, nx, ny, 16, 4096, u16le(vals.toIndexedSeq),
      extraTags = Seq((34710, 3, 1L))),
      "MAR CCD", (73.242, 73.242), vals.toIndexedSeq)
  }

  test("MAR CCD frame header mines wavelength/distance/center/pitch " +
      "with no .imctrl present") {
    val raw = buildTiff(le = true, nx, ny, 16, 4096, u16le(vals.toIndexedSeq),
      extraTags = Seq((34710, 3, 1L)))
    val bytes = withMarHeader(raw, Seq(
      640 -> 210000,   // xtal_to_detector: 1000*mm (unused when start/end set)
      644 -> 1536500,  // beam_x: 1000*pixels
      648 -> 1024250,  // beam_y
      696 -> 250000,   // start_xtal_to_detector: 1000*mm
      728 -> 250000,   // end_xtal_to_detector
      772 -> 79000,    // pixelsize_x: nm
      776 -> 79000,    // pixelsize_y
      908 -> 41300,    // source_wavelength: femtometers
      964 -> 0))       // optics_wavelength unset -> source wins
    val f = TiffDialects.decode(bytes).get
    assert(f.tifType == "MAR CCD")
    assert(f.pixelSizeUm == ((79.0, 79.0)))
    val hc = f.headerCal.get
    assert(math.abs(hc.wavelength.get - 0.413) < 1e-12)
    assert(math.abs(hc.distance.get - 250.0) < 1e-9)
    // center mm = (1000*px) * nm * 1e-9
    assert(math.abs(hc.center.get._1 - 1536.5 * 0.079) < 1e-9)
    assert(math.abs(hc.center.get._2 - 1024.25 * 0.079) < 1e-9)
    // the calibration override chain picks the mined values up
    val cal = TiffDialects.calibrationFrom(f, graft.core.Calibration())
    assert(cal.wavelength == hc.wavelength.get)
    assert(cal.distance == hc.distance.get)
    assert(cal.center == hc.center.get)
    assert(cal.pixelSize == ((79.0, 79.0)))
    assert(cal.imageSize == ((ny, nx)))
    // optics wavelength, when positive, wins over source; a stale value
    // at 940 (inside reserve_source in the published struct) is ignored
    val f2 = TiffDialects.decode(withMarHeader(raw.clone(),
      Seq(908 -> 41300, 940 -> 12345, 964 -> 70900))).get
    assert(math.abs(f2.headerCal.get.wavelength.get - 0.709) < 1e-12)
    // zero end-distance falls back to the static xtal_to_detector
    val f3 = TiffDialects.decode(withMarHeader(raw.clone(),
      Seq(640 -> 210000, 696 -> 250000, 728 -> 0))).get
    assert(math.abs(f3.headerCal.get.distance.get - 210.0) < 1e-9)
  }

  test("MAR CCD origin/view flags flip the image like the reference") {
    val raw = buildTiff(le = true, nx, ny, 16, 4096, u16le(vals.toIndexedSeq),
      extraTags = Seq((34710, 3, 1L)))
    // origin != 0 -> flipud; view_direction != 0 -> fliplr
    val both = TiffDialects.decode(withMarHeader(raw,
      Seq(116 -> 1, 124 -> 1))).get.samples.toSeq
    val m = vals.grouped(nx).toSeq
    val expect = m.reverse.flatMap(_.reverse)
    assert(both == expect)
  }

  test("CheMin multislice: LONG multi-strip gate, first slice flipped " +
      "and x10, fixed camera constants") {
    // a real baseline TIFF with TWO LONG strip offsets (the reference's
    // nSlice>1 gate): 4x4 uint16, two strips of two rows
    val iw = 4; val ih = 4
    val px16 = Array.tabulate(ih * iw)(i => i * 3)
    val bb = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0, 'I'.toByte); bb.put(1, 'I'.toByte); bb.putShort(2, 42)
    val strip1 = 8; val strip2 = 8 + iw * 2 * 2 // two rows per strip
    for (i <- 0 until ih * iw)
      bb.putShort(strip1 + i * 2, px16(i).toShort)
    val ifdOff = strip1 + ih * iw * 2
    bb.putInt(4, ifdOff)
    val tags = Seq(
      // (tag, type, count, value) — LONG arrays written after the IFD
      (256, 3, 1, iw.toLong), (257, 3, 1, ih.toLong),
      (258, 3, 1, 16L), (259, 3, 1, 1L), (262, 3, 1, 1L),
      (273, 4, 2, -1L), // placeholder: offsets array
      (278, 3, 1, 2L),
      (279, 4, 2, -2L)) // placeholder: byte-counts array
    bb.putShort(ifdOff, tags.length.toShort)
    val arrOffsets = ifdOff + 2 + tags.length * 12 + 4
    val arrCounts = arrOffsets + 8
    tags.zipWithIndex.foreach { case ((tag, typ, count, v), i) =>
      val base = ifdOff + 2 + i * 12
      bb.putShort(base, tag.toShort); bb.putShort(base + 2, typ.toShort)
      bb.putInt(base + 4, count)
      v match {
        case -1L => bb.putInt(base + 8, arrOffsets)
        case -2L => bb.putInt(base + 8, arrCounts)
        case x if typ == 3 => bb.putShort(base + 8, x.toShort)
        case x => bb.putInt(base + 8, x.toInt)
      }
    }
    bb.putInt(arrOffsets, strip1); bb.putInt(arrOffsets + 4, strip2)
    bb.putInt(arrCounts, iw * 2 * 2); bb.putInt(arrCounts + 4, iw * 2 * 2)
    val bytes = java.util.Arrays.copyOf(bb.array(), arrCounts + 8)

    val f = TiffDialects.decode(bytes).getOrElse(fail("CheMin not decoded"))
    assert(f.tifType == "CheMin")
    assert(f.pixelSizeUm == ((40.0, 40.0)))
    // flipud(raw) * 10 (reference GSASII_imports.py:1197)
    val expect = (0 until ih).flatMap(y =>
      (0 until iw).map(x => px16((ih - 1 - y) * iw + x) * 10))
    assert(f.samples.toSeq == expect)
    val hc = f.headerCal.get
    assert(hc.wavelength.contains(1.78892))
    assert(hc.distance.contains(18.0))
    assert(hc.center.contains((40.0 * iw / 2000.0, 0.0)))
  }

  test("garbage and truncated payloads return None, not an exception") {
    assert(TiffDialects.decode(Array.fill[Byte](64)(33)).isEmpty)
    // file caught mid-write: IFD (written last) missing entirely
    val whole = buildTiff(le = true, nx, ny, 16, 8,
      u16le(vals.toIndexedSeq), stringTag = Some((272, "GE Detector")))
    assert(TiffDialects.decode(whole.take(whole.length / 2)).isEmpty)
  }
}
