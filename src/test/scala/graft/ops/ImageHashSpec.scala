package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Perceptual image hashing (aHash): stability under re-encoding and
  * mild noise, discrimination between different scenes, the banded
  * near-dup pair recovery without an all-pairs join, and the
  * small-image/undecodable guards. */
class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  /** Patterned PNG: luma = pattern(x, y), with optional deterministic
    * per-pixel noise. */
  private def png(w: Int, h: Int, pattern: (Int, Int) => Int,
                  noise: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rnd = new scala.util.Random(42)
    for (y <- 0 until h; x <- 0 until w) {
      val v0 = pattern(x, y)
      val v = math.max(0, math.min(255,
        v0 + (if (noise > 0) rnd.nextInt(2 * noise + 1) - noise else 0)))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val leftBright = (x: Int, y: Int) => if (x < 32) 220 else 40
  private val topBright = (x: Int, y: Int) => if (y < 32) 220 else 40
  private val gradient = (x: Int, y: Int) => (x * 4) % 256

  test("stable under mild noise; different scenes land far apart") {
    val clean = Multimodal.aHashOf(png(64, 64, leftBright))
    val noisy = Multimodal.aHashOf(png(64, 64, leftBright, noise = 12))
    val other = Multimodal.aHashOf(png(64, 64, topBright))
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(dist(clean, noisy) <= 3,
      s"noise moved the hash ${dist(clean, noisy)} bits")
    assert(dist(clean, other) >= 16,
      s"different scenes only ${dist(clean, other)} bits apart")
    // resolution invariance of the pooled grid (same scene at half
    // resolution: bright left half, in that image's own coordinates)
    val small = Multimodal.aHashOf(
      png(32, 32, (x, _) => if (x < 16) 220 else 40))
    assert(dist(clean, small) <= 3)
  }

  test("banded near-dup pairs recover the noised copy, not the stranger") {
    val assets = Seq(
      (1L, "image", png(64, 64, leftBright)),
      (2L, "image", png(64, 64, leftBright, noise = 12)),
      (3L, "image", png(64, 64, topBright)),
      (4L, "image", png(64, 64, gradient)),
      (5L, "image", Array[Byte](1, 2, 3)), // undecodable -> dropped
      (6L, "audio", Array[Byte](0, 0)))    // wrong modality -> ignored
      .toDF("asset_id", "modality", "payload")
    val hashes = Multimodal.imageHashes(assets)
    assert(hashes.count() == 4)
    val pairs = Multimodal.nearDupImagePairs(hashes, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"expected only the noised copy pair, got $pairs")
  }

  test("skewed-aspect images sample every cell (no silent zero hash)") {
    // a 2048x32 strip: a single max(w,h)-derived stride would skip
    // whole grid rows, NaN the cell means, and hash everything to 0 —
    // the per-axis strides must keep the hash meaningful
    val strip = Multimodal.aHashOf(
      png(2048, 32, (x, _) => if (x < 1024) 220 else 40))
    val stripOther = Multimodal.aHashOf(
      png(2048, 32, (_, y) => if (y < 16) 220 else 40))
    assert(strip != 0L && stripOther != 0L)
    assert(java.lang.Long.bitCount(strip ^ stripOther) >= 16)
  }

  test("undersized images are rejected loudly") {
    val e = intercept[Exception] {
      Multimodal.aHashOf(png(4, 4, leftBright))
    }
    assert(e.getMessage.contains("8x8"))
  }
}
