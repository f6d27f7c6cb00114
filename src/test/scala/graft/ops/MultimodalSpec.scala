package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  def assets = Seq(
    (1L, "image", "image/png", Array[Byte](10, 20, 30, 40), Map("k" -> "v")),
    (2L, "audio", "audio/wav", Array[Byte](1, 2, 3, 4, 5), Map.empty[String, String]),
    (3L, "video", "video/mp4", Array.tabulate(64)(_.toByte), Map.empty[String, String]),
    (4L, "image", "image/png", Array[Byte](1), Map.empty[String, String]), // corrupt
    (5L, "weird", "x/y", Array[Byte](9, 9, 9, 9), Map.empty[String, String]))
    .toDF("asset_id", "modality", "mime", "payload", "meta")

  test("extractFeatures: typed rows, corrupt/unknown isolated as ok=false") {
    val out = Multimodal.extractFeatures(assets).collect()
      .map(f => f.asset_id -> f).toMap
    assert(out(1L).ok && out(1L).width > 0 && out(1L).feature.length == 8)
    assert(out(2L).ok && out(2L).duration_ms > 0)
    assert(out(3L).ok && out(3L).duration_ms > 0 && out(3L).width > 0)
    assert(!out(4L).ok && !out(5L).ok)
    // determinism
    val again = Multimodal.extractFeatures(assets).collect()
      .map(f => f.asset_id -> f.feature.toSeq).toMap
    assert(out.view.mapValues(_.feature.toSeq).toMap == again)
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
