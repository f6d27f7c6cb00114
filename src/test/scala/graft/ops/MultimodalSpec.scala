package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Real PNG payload: solid (r, g, b) w x h image. */
  private def png(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real WAV payload: 16-bit LE mono PCM sine at `freq` Hz. */
  private def wav(seconds: Double, freq: Double,
                  rate: Float = 8000f): Array[Byte] = {
    val n = (seconds * rate).toInt
    val pcm = new Array[Byte](2 * n)
    for (i <- 0 until n) {
      val v = (math.sin(2 * math.Pi * freq * i / rate) * 20000).toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  def assets = Seq(
    (1L, "image", "image/png", png(40, 30, 200, 50, 25),
      Map("k" -> "v")),
    (2L, "audio", "audio/wav", wav(0.5, 440.0),
      Map.empty[String, String]),
    (3L, "video", "video/mp4", Array.tabulate(64)(_.toByte),
      Map.empty[String, String]),
    (4L, "image", "image/png", Array[Byte](1, 2, 3),  // corrupt
      Map.empty[String, String]),
    (5L, "weird", "x/y", Array[Byte](9, 9, 9, 9),
      Map.empty[String, String]))
    .toDF("asset_id", "modality", "mime", "payload", "meta")

  test("extractFeatures: REAL image/audio decode, corrupt/unknown " +
      "isolated as ok=false") {
    val out = Multimodal.extractFeatures(assets).collect()
      .map(f => f.asset_id -> f).toMap
    // image: true dimensions and channel means of the solid color
    assert(out(1L).ok && out(1L).width == 40 && out(1L).height == 30)
    assert(math.abs(out(1L).feature(0) - 200 / 255f) < 0.01) // mean R
    assert(math.abs(out(1L).feature(1) - 50 / 255f) < 0.01)  // mean G
    assert(math.abs(out(1L).feature(2) - 25 / 255f) < 0.01)  // mean B
    // audio: true duration and non-trivial RMS in every window
    assert(out(2L).ok && math.abs(out(2L).duration_ms - 500L) <= 1)
    assert(out(2L).feature.length == 8 && out(2L).feature.forall(_ > 0.3f))
    // video: stub path still typed and deterministic
    assert(out(3L).ok && out(3L).duration_ms > 0 && out(3L).width > 0)
    assert(!out(4L).ok && !out(5L).ok)
    // determinism
    val again = Multimodal.extractFeatures(assets).collect()
      .map(f => f.asset_id -> f.feature.toSeq).toMap
    assert(out.view.mapValues(_.feature.toSeq).toMap == again)
  }

  test("thumbnails: real bilinear resize keeps the dominant color") {
    val th = Multimodal.thumbnails(assets, 8, 8).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(th.keySet == Set(1L)) // only the decodable image survives
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(th(1L)))
    assert(img.getWidth == 8 && img.getHeight == 8)
    val rgb = img.getRGB(4, 4)
    assert(((rgb >> 16) & 0xff) > 180 && (rgb & 0xff) < 60)
  }

  test("sampleFrames: evenly spaced timestamps per video") {
    val feats = Multimodal.extractFeatures(assets)
    val frames = Multimodal.sampleFrames(feats, 4)
      .orderBy(col("frame_idx")).collect()
    assert(frames.length == 4)
    assert(frames.map(_.getAs[Long]("ts_ms")).toSeq ==
      frames.map(r => r.getAs[Int]("frame_idx") *
        r.getAs[Long]("duration_ms") / 4).toSeq)
  }
}
