package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for corpus pipelines: images/audio/video as
  * opaque `binary` columns with typed metadata, batched feature extraction
  * via mapPartitions, and frame sampling.
  *
  * The decode kernels themselves are STUBBED deterministically (no media
  * codecs ship in this environment) — clearly marked below — but the
  * Spark-side contract is real and tested: schema, batching shape,
  * partition sizing, and null/corrupt-payload behavior are exactly what a
  * production decode (e.g. a JNI codec) would plug into.
  */
object Multimodal {

  /** Canonical schema for a multimodal asset table. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType),  // image | audio | video
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("meta", MapType(StringType, StringType))))

  /** Feature row produced per asset. */
  case class AssetFeatures(asset_id: Long, modality: String,
      n_bytes: Long, ok: Boolean, width: Int, height: Int,
      duration_ms: Long, feature: Array[Float])

  /** STUB decode: a real implementation would decode the payload with a
    * media library. This stand-in derives deterministic pseudo-features
    * from the bytes so the distributed plumbing (batch iteration, error
    * isolation, output schema) is fully exercisable. */
  private def decodeStub(modality: String,
                         payload: Array[Byte]): (Int, Int, Long) = {
    if (payload == null || payload.length < 4)
      throw new IllegalArgumentException("corrupt payload")
    def b(i: Int): Int = payload(i % payload.length) & 0xff
    modality match {
      case "image" => (64 + b(0) % 512, 64 + b(1) % 512, 0L)
      case "audio" => (0, 0, 1000L + b(2) * 37L)
      case "video" => (64 + b(0) % 512, 64 + b(1) % 512, 5000L + b(3) * 997L)
      case _ => throw new IllegalArgumentException(s"modality $modality")
    }
  }

  /** Deterministic 8-dim pseudo-embedding of a payload (STUB for a real
    * feature extractor). */
  private def featureStub(payload: Array[Byte]): Array[Float] =
    Array.tabulate(8) { i =>
      var h = 1125899906842597L
      var j = i
      while (j < payload.length) { h = 31 * h + payload(j); j += 8 }
      ((h % 1000) / 1000.0f)
    }

  /** Batched feature extraction over the asset table: one decoder
    * instantiation per PARTITION (the expensive part for real codecs),
    * streaming rows through it; corrupt payloads yield ok=false rows
    * instead of failing the task. */
  def extractFeatures(assets: DataFrame): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select(col("asset_id"), col("modality"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (real codec handle)
        it.map { case (id, mod, payload) =>
          try {
            val (w, h, dur) = decodeStub(mod, payload)
            AssetFeatures(id, mod, Option(payload).map(_.length.toLong)
              .getOrElse(0L), ok = true, w, h, dur, featureStub(payload))
          } catch { case _: Exception =>
            AssetFeatures(id, mod, Option(payload).map(_.length.toLong)
              .getOrElse(0L), ok = false, 0, 0, 0L, Array.empty[Float])
          }
        }
      }
  }

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
