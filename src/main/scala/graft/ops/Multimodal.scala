package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.ByteArrayInputStream

/** Multimodal-column operators for corpus pipelines: images/audio/video
  * as opaque `binary` columns with typed metadata, batched decode +
  * feature extraction via mapPartitions, thumbnail resize, and video
  * frame sampling.
  *
  * Image decode (PNG/JPEG/BMP/GIF via javax.imageio) and audio decode
  * (WAV/AIFF PCM via javax.sound.sampled) are REAL — both codecs ship
  * with the JDK, so executors decode genuine payloads with no external
  * dependency. Video decode alone is STUBBED deterministically (no video
  * codec ships in this environment) — clearly marked below — with the
  * same distributed contract a JNI codec would plug into: per-partition
  * batching, corrupt-payload isolation (ok=false rows, never task
  * failure), fixed feature schema.
  */
object Multimodal {

  /** Thrown ONLY by [[aHashOf]]'s sampling-loop self-check — a type no
    * JDK codec path can throw, so quarantining callers can let exactly
    * this one propagate (an engine bug must fail the job) while
    * swallowing every decode failure a malformed payload can produce. */
  final class StrideInvariantViolation(msg: String)
      extends IllegalStateException(msg)

  /** Canonical schema for a multimodal asset table. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType),  // image | audio | video
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("meta", MapType(StringType, StringType))))

  /** Feature row produced per asset. `feature` is always 8-dim:
    * image -> (meanR, meanG, meanB, meanLuma, luma histogram x4),
    * audio -> RMS over 8 equal time windows,
    * video -> deterministic stub. */
  case class AssetFeatures(asset_id: Long, modality: String,
      n_bytes: Long, ok: Boolean, width: Int, height: Int,
      duration_ms: Long, feature: Array[Float])

  /** REAL image decode: dimensions + channel means + 4-bin luma
    * histogram. Large images are sampled on a stride grid (bounded work
    * per asset regardless of resolution). */
  private def decodeImage(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val stride = math.max(1, math.max(w, h) / 256)
    var r = 0.0; var g = 0.0; var b = 0.0; var n = 0L
    val hist = new Array[Long](4)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val rv = (rgb >> 16) & 0xff; val gv = (rgb >> 8) & 0xff
        val bv = rgb & 0xff
        r += rv; g += gv; b += bv; n += 1
        val luma = (rv * 299 + gv * 587 + bv * 114) / 1000
        hist(math.min(3, luma / 64)) += 1
        x += stride
      }
      y += stride
    }
    val f = Array(
      (r / n / 255.0).toFloat, (g / n / 255.0).toFloat,
      (b / n / 255.0).toFloat,
      ((r * 0.299 + g * 0.587 + b * 0.114) / n / 255.0).toFloat,
      (hist(0).toDouble / n).toFloat, (hist(1).toDouble / n).toFloat,
      (hist(2).toDouble / n).toFloat, (hist(3).toDouble / n).toFloat)
    (w, h, f)
  }

  /** REAL audio decode (WAV/AIFF PCM): duration + RMS energy over 8
    * equal windows. */
  private def decodeAudio(payload: Array[Byte]): (Long, Array[Float]) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(payload))
    try {
      val fmt = in.getFormat
      val nFrames = in.getFrameLength
      val durMs = (nFrames * 1000.0 / fmt.getFrameRate).toLong
      val bytes = in.readAllBytes()
      val bps = fmt.getSampleSizeInBits / 8
      require(bps == 2 && !fmt.isBigEndian, "expect 16-bit LE PCM")
      val nSamples = bytes.length / bps
      val win = math.max(1, nSamples / 8)
      val rms = new Array[Float](8)
      var wIdx = 0
      while (wIdx < 8) {
        var s = 0.0; var i = wIdx * win
        val end = math.min(nSamples, (wIdx + 1) * win)
        while (i < end) {
          val v = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort
          s += v.toDouble * v; i += 1
        }
        rms(wIdx) =
          if (end > wIdx * win)
            (math.sqrt(s / (end - wIdx * win)) / 32768.0).toFloat
          else 0f
        wIdx += 1
      }
      (durMs, rms)
    } finally in.close()
  }

  /** STUB video decode — no video codec ships in this environment. A
    * real implementation replaces ONLY this function; everything around
    * it (batching, error isolation, schema) is production-shaped. */
  private def decodeVideoStub(payload: Array[Byte]): (Int, Int, Long) = {
    if (payload == null || payload.length < 4)
      throw new IllegalArgumentException("corrupt payload")
    def b(i: Int): Int = payload(i % payload.length) & 0xff
    (64 + b(0) % 512, 64 + b(1) % 512, 5000L + b(3) * 997L)
  }

  private def featureStub(payload: Array[Byte]): Array[Float] =
    Array.tabulate(8) { i =>
      var h = 1125899906842597L
      var j = i
      while (j < payload.length) { h = 31 * h + payload(j); j += 8 }
      ((h % 1000) / 1000.0f)
    }

  /** Batched decode + feature extraction over the asset table: one
    * decoder scope per PARTITION, streaming rows through it; corrupt or
    * unsupported payloads yield ok=false rows instead of failing the
    * task. */
  def extractFeatures(assets: DataFrame): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, mod, payload) =>
          val nb = Option(payload).map(_.length.toLong).getOrElse(0L)
          try {
            mod match {
              case "image" =>
                val (w, h, f) = decodeImage(payload)
                AssetFeatures(id, mod, nb, ok = true, w, h, 0L, f)
              case "audio" =>
                val (dur, f) = decodeAudio(payload)
                AssetFeatures(id, mod, nb, ok = true, 0, 0, dur, f)
              case "video" =>
                val (w, h, dur) = decodeVideoStub(payload)
                AssetFeatures(id, mod, nb, ok = true, w, h, dur,
                  featureStub(payload))
              case other =>
                throw new IllegalArgumentException(s"modality $other")
            }
          } catch { case _: Exception =>
            AssetFeatures(id, mod, nb, ok = false, 0, 0, 0L,
              Array.empty[Float])
          }
        }
      }
  }

  /** REAL thumbnail resize (Java2D bilinear): payload -> PNG bytes at
    * (w, h). Runs per asset inside mapPartitions like the extractor. */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gfx = out.createGraphics()
    gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    gfx.drawImage(img, 0, 0, w, h, null)
    gfx.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  /** Thumbnail column transform: (asset_id, payload) -> (asset_id,
    * thumb) for image assets, corrupt rows dropped (they are already
    * accounted in [[extractFeatures]] ok=false). */
  def thumbnails(assets: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.where(col("modality") === "image")
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          scala.util.Try((id, resizeImage(payload, w, h))).toOption
        }
      }
      .toDF("asset_id", "thumb")
  }

  /** 64-bit average-hash (aHash) perceptual fingerprint: the image is
    * pooled onto an 8×8 luma grid (exact integer sums over the cells'
    * pixel rectangles, strided like [[decodeImage]] so work per asset
    * is bounded at any resolution), and bit (cy*8+cx) is set when the
    * cell's mean luma is >= the mean of the 64 cell means. Two images
    * that differ by re-encoding, mild noise, or resizing land a few
    * bits apart (Hamming distance), which is what image-level near-dup
    * dedup keys on — the visual analogue of SimHash. Deterministic:
    * integer cell sums, one double division per cell. Images smaller
    * than the 8×8 grid are rejected (some cells would be empty). */
  def aHashOf(payload: Array[Byte]): Long = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    require(w >= 8 && h >= 8, s"image ${w}x$h smaller than the 8x8 grid")
    // PER-AXIS strides: a single stride from max(w, h) would skip whole
    // grid rows on skewed-aspect images (a 2048x32 strip at stride 8
    // only samples every other cell row), leaving 0-count cells whose
    // NaN means silently zero the hash. strideX <= w/8 and
    // strideY <= h/8 hold by construction (256 >= 8), so every cell is
    // sampled; total work stays bounded at <= 256x256 samples.
    val strideX = math.max(1, w / 256)
    val strideY = math.max(1, h / 256)
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val cx = x * 8 / w
        val rgb = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        sums(cy * 8 + cx) += luma
        counts(cy * 8 + cx) += 1
        x += strideX
      }
      y += strideY
    }
    // a DEDICATED exception type, deliberately distinct from the two
    // require guards above: those reject bad INPUTS (quarantined by
    // callers), this one flags a bug in the sampling loop itself and
    // must PROPAGATE — and the type must be one no JDK codec path can
    // throw, so [[imageHashes]]'s catch discrimination is exact (a
    // broad IllegalStateException check would also propagate codec
    // ISEs on malformed payloads, failing the job on one bad asset)
    if (!counts.forall(_ > 0))
      throw new StrideInvariantViolation(
        s"aHash sampling left an empty cell on a ${w}x$h image — " +
          "stride invariant violated")
    val means = Array.tabulate(64)(i => sums(i).toDouble / counts(i))
    val global = means.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (means(i) >= global) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Perceptual hashes for image assets: (asset_id, ahash); undecodable
    * or under-sized payloads are dropped here (already accounted as
    * ok=false by [[extractFeatures]] — the quarantine convention
    * [[thumbnails]] uses). Decode failures are quarantined in FULL
    * breadth — [[aHashOf]]'s input guards (IllegalArgumentException),
    * codec IOExceptions, AND whatever RuntimeExceptions the JDK
    * decoders throw on malformed payloads (CMMException on a corrupt
    * ICC profile, ArrayIndexOutOfBounds on truncated data, codec-side
    * IllegalStateExceptions) — with ONE deliberate exception: the
    * dedicated [[StrideInvariantViolation]] is a BUG in this file's
    * own sampling loop and PROPAGATES to fail the job instead of
    * surfacing as silently missing assets; its type makes the
    * discrimination exact. */
  def imageHashes(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.where(col("modality") === "image")
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          try Some((id, aHashOf(payload)))
          catch {
            case e: StrideInvariantViolation => throw e
            case scala.util.control.NonFatal(_) => None
          }
        }
      }
      .toDF("asset_id", "ahash")
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Image near-dup candidate pairs within `maxDist` Hamming bits,
    * WITHOUT an all-pairs scan — [[Dedup.hammingBandedPairs]] over the
    * aHash fingerprints (banding semantics, pigeonhole recall bound,
    * and the below-the-exchange Hamming filter are documented there). */
  def nearDupImagePairs(hashes: DataFrame, maxDist: Int): DataFrame =
    // one shared assembly with the text SimHash path — the pin before
    // the self-join matters MOST here (both banded sides would re-run
    // the ImageIO decode lineage, the dominant cost of the operator)
    Dedup.hammingBandedPairs(hashes, "asset_id", "ahash", maxDist)

  /** Video frame sampling plan: explode each video asset into `n` evenly
    * spaced (asset_id, frame_idx, ts_ms) rows — the shuffle-free fan-out a
    * real frame extractor would map over. */
  def sampleFrames(features: Dataset[AssetFeatures], n: Int): DataFrame = {
    val df = features.toDF()
    df.where(col("modality") === "video" && col("ok"))
      .select(col("asset_id"), col("duration_ms"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_idx"))
      .withColumn("ts_ms",
        (col("frame_idx") * col("duration_ms") / n).cast("long"))
  }
}
