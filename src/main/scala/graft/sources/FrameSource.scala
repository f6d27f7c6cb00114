package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

/** Detector-frame sources: filename identity parsing, batch and streaming
  * binary-file readers, and the TIFF → pixel-rows decoder.
  *
  * Reference: the watchdog directory monitor + regex frame identity
  * (pipeline_queue.py:34-86: `(name)[_-](NNNNN)(ext)`), backfill glob
  * (pipeline_queue.py:884-923), debounce (pipeline_queue.py:740), and the
  * multi-dialect TIFF reader (GetTifData GSASII_imports.py:1068-1399).
  *
  * Spark-first: `binaryFile` is the one source format for both batch and
  * streaming; frame identity is a column expression over the path; decode
  * is a flatMap from (path, bytes) to pixel rows executed on executors —
  * a 100 TB backlog of frames decodes with full cluster parallelism, no
  * driver queue.
  */
object FrameSource {

  /** Frame-identity regex (reference pipeline_queue.py:41): dataset name,
    * 5-digit frame number, extension. */
  val frameRegex = "^(.*?)[-_](\\d{5})\\.(tif|tiff|png)$"

  /** Parse (dataset, frame_no) from a `path` column; non-matching paths
    * get null frame_no (ANSI-safe cast). */
  def withFrameIdentity(df: DataFrame): DataFrame = {
    val fname = element_at(split(col("path"), "/"), -1)
    val no = regexp_extract(fname, frameRegex, 2)
    df.withColumn("dataset", regexp_extract(fname, frameRegex, 1))
      .withColumn("frame_no",
        when(length(no) > 0, no).otherwise(lit(null)).cast("int"))
  }

  /** Batch backfill scan (reference S2) with include/exclude filters
    * (reference S3: pipeline_queue.py:45-52). */
  def backfill(spark: SparkSession, dir: String,
               include: Option[String] = None,
               exclude: Option[String] = None): DataFrame = {
    var df = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tif*").load(dir)
    include.foreach(p => df = df.where(col("path").rlike(p)))
    exclude.foreach(p => df = df.where(!col("path").rlike(p)))
    withFrameIdentity(df)
  }

  /** Mtime debounce (reference S4, pipeline_queue.py:740) for BATCH
    * scans: drop files modified within the last `seconds`. Safe in batch
    * because the next run re-lists the directory and picks the file up.
    * Deliberately NOT applied as a row filter to the streaming source: a
    * file-stream source marks a file processed the first time it is
    * LISTED, so a row-level mtime filter would drop a young file's rows
    * permanently rather than defer them. The streaming equivalent is the
    * WAIT-based `debounceSeconds` option of `StreamingPipeline.start`
    * (hold the micro-batch until its youngest file reaches the debounce
    * age — same quiescence guarantee, no data loss), on top of the decode
    * quarantine in [[toPixels]] plus the atomic-rename writer
    * convention. */
  def debounceFilter(df: DataFrame, seconds: Int): DataFrame =
    df.where(col("modificationTime") <
      current_timestamp() - expr(s"INTERVAL $seconds SECONDS"))

  /** Streaming source over the same directory (reference S1's watchdog).
    * `maxFilesPerTrigger` bounds micro-batch size. */
  /** binaryFile's fixed schema (streaming sources need it explicit). */
  private val binarySchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content",
      org.apache.spark.sql.types.BinaryType)))

  def stream(spark: SparkSession, dir: String,
             maxFilesPerTrigger: Int = 32): DataFrame = {
    val df = spark.readStream.format("binaryFile")
      .schema(binarySchema)
      .option("pathGlobFilter", "*.tif*")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
    withFrameIdentity(df)
  }

  /** Decode TIFF payload bytes → (y, x, intensity) pixel rows. Executed
    * per file on executors. Uses javax.imageio's TIFF plugin (JDK 9+),
    * coercing samples to int (reference coerces all dialects to int32,
    * GSASII_imports.py:1163+). */
  def decodeTiff(bytes: Array[Byte]): Iterator[(Int, Int, Int)] =
    decodeAny(bytes).getOrElse(
      throw new IllegalArgumentException("undecodable TIFF payload"))

  /** Detector-dialect decode first (raw-payload pseudo-TIFFs standard
    * readers cannot parse — [[TiffDialects]]), then javax.imageio for
    * baseline TIFF/PNG. None = undecodable by either. */
  private[sources] def decodeAny(
      bytes: Array[Byte]): Option[Iterator[(Int, Int, Int)]] =
    TiffDialects.decode(bytes).map(frameRows).orElse(
      scala.util.Try(ImageIO.read(new ByteArrayInputStream(bytes)))
        .toOption.filter(_ != null).map(rasterRows))

  private def frameRows(
      f: TiffDialects.DetectorFrame): Iterator[(Int, Int, Int)] =
    (0 until f.ny).iterator.flatMap { y =>
      val base = y * f.nx
      (0 until f.nx).iterator.map(x => (y, x, f.samples(base + x)))
    }

  /** Stream (y, x, v) rows out of a fully-decoded image. ImageIO.read
    * decodes the whole payload eagerly, so failures surface there — by
    * the time this runs, row access cannot throw. */
  private def rasterRows(
      img: java.awt.image.BufferedImage): Iterator[(Int, Int, Int)] = {
    val raster = img.getRaster
    val (w, h) = (raster.getWidth, raster.getHeight)
    val row = new Array[Int](w)
    (0 until h).iterator.flatMap { y =>
      raster.getSamples(0, y, w, 1, 0, row)
      val copy = row.clone()
      (0 until w).iterator.map(x => (y, x, copy(x)))
    }
  }

  /** (dataset, frame_no, path, content) → pixel table
    * (dataset, frame_no, y, x, intensity). A frame whose payload fails to
    * decode (e.g. a partially-written file caught mid-copy) emits ONE
    * sentinel row (y = -1, x = -1) instead of throwing, so the batch
    * survives and the caller can quarantine the frame — nothing is
    * silently dropped and nothing kills the stream. */
  def toPixels(frames: DataFrame): DataFrame = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.select(col("dataset"), col("frame_no"), col("content"))
      .as[(String, Int, Array[Byte])]
      .flatMap { case (ds, no, bytes) =>
        decodeAny(bytes) match {
          case Some(rows) =>
            rows.map { case (y, x, v) => (ds, no, y, x, v) }
          case None => Iterator((ds, no, -1, -1, 0))
        }
      }
      .toDF("dataset", "frame_no", "y", "x", "intensity")
  }

  /** S10 — load a correction/mask frame (flat-field, dark, gain, predef
    * mask TIFF) as a (y, x, value) table ready for
    * `Corrections.Frames` / mask algebra. Decode runs executor-side like
    * any other frame. */
  def loadCorrectionFrame(spark: SparkSession, path: String): DataFrame =
    toPixels(spark.read.format("binaryFile").load(path)
        .select(lit("corrections").as("dataset"), lit(0).as("frame_no"),
          col("content")))
      .where(col("y") >= 0) // drop quarantine sentinels
      .select(col("y"), col("x"),
        col("intensity").cast("double").as("value"))

  /** Encode an int-matrix as a single-band 16-bit grayscale TIFF (test
    * fixture generator + mask sink encoder). Hand-rolled baseline TIFF
    * with ONE strip: ImageIO's writer splits the image into multiple
    * LONG-typed strips, which is exactly the reference's CheMin
    * multislice discriminator (GSASII_imports.py:1144-1147,1184) — our
    * own sink output must never look like a CheMin frame. Single-strip
    * uncompressed uint16 is readable by PIL/ImageIO/everything. */
  def encodeTiff(matrix: Array[Array[Int]]): Array[Byte] = {
    val h = matrix.length; val w = matrix(0).length
    val payloadOff = 8
    val ifdOff = payloadOff + w * h * 2
    // (tag, type, count, value); SHORT(3) or LONG(4), all inline
    val tags = Seq(
      (256, 4, w), (257, 4, h), (258, 3, 16), (259, 3, 1), (262, 3, 1),
      (273, 4, payloadOff), (277, 3, 1), (278, 4, h), (279, 4, w * h * 2))
    val bb = java.nio.ByteBuffer.allocate(ifdOff + 2 + tags.length * 12 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(0, 'I'.toByte); bb.put(1, 'I'.toByte)
    bb.putShort(2, 42.toShort); bb.putInt(4, ifdOff)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        bb.putShort(payloadOff + (y * w + x) * 2,
          (matrix(y)(x) & 0xffff).toShort)
        x += 1
      }
      y += 1
    }
    bb.putShort(ifdOff, tags.length.toShort)
    tags.zipWithIndex.foreach { case ((tag, typ, value), i) =>
      val base = ifdOff + 2 + i * 12
      bb.putShort(base, tag.toShort)
      bb.putShort(base + 2, typ.toShort)
      bb.putInt(base + 4, 1)
      if (typ == 3) bb.putShort(base + 8, value.toShort)
      else bb.putInt(base + 8, value)
    }
    bb.putInt(ifdOff + 2 + tags.length * 12, 0) // next-IFD terminator
    bb.array()
  }

  /** Encode a float-matrix as a single-band float32 TIFF — the format of
    * the reference's per-calibration geometry map files
    * (`maps/<imctrl>_{2thetamap,azmmap,pixelsampledistmap,polscalemap,
    * qmap}.tif`, PIL Image.fromarray of a float32 array,
    * cache_creation.py:66-84). Single strip, SampleFormat=IEEEFP(3),
    * BitsPerSample=32 — readable by PIL/tifffile exactly like the
    * reference's own output. */
  def encodeTiffFloat(matrix: Array[Array[Float]]): Array[Byte] = {
    val h = matrix.length; val w = matrix(0).length
    val payloadOff = 8
    val ifdOff = payloadOff + w * h * 4
    val tags = Seq(
      (256, 4, w), (257, 4, h), (258, 3, 32), (259, 3, 1), (262, 3, 1),
      (273, 4, payloadOff), (277, 3, 1), (278, 4, h), (279, 4, w * h * 4),
      (339, 3, 3)) // SampleFormat = IEEE float
    val bb = java.nio.ByteBuffer.allocate(ifdOff + 2 + tags.length * 12 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(0, 'I'.toByte); bb.put(1, 'I'.toByte)
    bb.putShort(2, 42.toShort); bb.putInt(4, ifdOff)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        bb.putFloat(payloadOff + (y * w + x) * 4, matrix(y)(x))
        x += 1
      }
      y += 1
    }
    bb.putShort(ifdOff, tags.length.toShort)
    tags.zipWithIndex.foreach { case ((tag, typ, value), i) =>
      val base = ifdOff + 2 + i * 12
      bb.putShort(base, tag.toShort)
      bb.putShort(base + 2, typ.toShort)
      bb.putInt(base + 4, 1)
      if (typ == 3) bb.putShort(base + 8, value.toShort)
      else bb.putInt(base + 8, value)
    }
    bb.putInt(ifdOff + 2 + tags.length * 12, 0)
    bb.array()
  }

  /** Decode a single-strip float32 TIFF (the inverse of
    * [[encodeTiffFloat]]; also reads the reference's own map files) into
    * a row-major float matrix. Minimal baseline-IFD walk — enough for
    * the map-file layout both engines write; NOT a general TIFF reader
    * ([[TiffDialects]] is that). */
  def decodeTiffFloat(bytes: Array[Byte]): Array[Array[Float]] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bb.get(0) == 'I' && bb.get(1) == 'I' && bb.getShort(2) == 42,
      "not a little-endian TIFF")
    val ifdOff = bb.getInt(4)
    val n = bb.getShort(ifdOff).toInt
    var (w, h, strip, bits, fmt) = (0, 0, 0, 0, 1)
    var rowsPerStrip = Int.MaxValue
    (0 until n).foreach { i =>
      val base = ifdOff + 2 + i * 12
      val tag = bb.getShort(base).toInt
      val typ = bb.getShort(base + 2).toInt
      val cnt = bb.getInt(base + 4)
      val v = if (typ == 3) bb.getShort(base + 8).toInt else bb.getInt(base + 8)
      // a multi-strip file (count > 1) stores a POINTER to an offsets
      // array in tags 273/279 — reading it as the strip offset would pass
      // the format checks and return garbage pixels; modern PIL writes
      // multi-strip (RowsPerStrip ~64KB) for large maps, so fail loudly
      if (tag == 273 || tag == 279)
        require(cnt == 1, s"multi-strip TIFF (tag $tag count $cnt): only " +
          "single-strip float32 maps are supported here")
      tag match {
        case 256 => w = v
        case 257 => h = v
        case 258 => bits = v
        case 273 => strip = v
        case 278 => rowsPerStrip = v
        case 339 => fmt = v
        case _ =>
      }
    }
    require(bits == 32 && fmt == 3,
      s"expected float32 TIFF, got bits=$bits sampleFormat=$fmt")
    require(rowsPerStrip >= h,
      s"multi-strip TIFF (RowsPerStrip=$rowsPerStrip < height $h)")
    Array.tabulate(h, w)((y, x) => bb.getFloat(strip + (y * w + x) * 4))
  }
}
