package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.SyntheticFrame
import graft.geometry.Geometry
import graft.sources.FrameSource

class FrameSourceSpec extends SparkSpec {

  test("TIFF round-trip: encode -> decode preserves the pixel matrix") {
    val m = Array.tabulate(16, 16)((y, x) => y * 100 + x)
    val decoded = FrameSource.decodeTiff(FrameSource.encodeTiff(m)).toSeq
    assert(decoded.size == 256)
    assert(decoded.forall { case (y, x, v) => v == y * 100 + x })
  }

  test("frame identity regex parses dataset and number") {
    import spark.implicits._
    val df = Seq("/data/MA2-00001.tif", "/data/run_b_00042.tif",
      "/data/skipme.txt").toDF("path")
    val out = FrameSource.withFrameIdentity(df)
      .where(col("frame_no").isNotNull)
      .select(col("dataset"), col("frame_no")).collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    assert(out == Set(("MA2", 1), ("run_b", 42)))
  }
}

class StreamingPipelineSpec extends SparkSpec {

  test("end-to-end: tiff files -> streaming backfill -> parquet sinks") {
    val cal = SyntheticFrame.testCalibration(96)
    val geo = Geometry.build(spark, cal).localCheckpoint(true)

    // write 2 frames of a synthetic dataset as real TIFF files
    val tmpIn = java.nio.file.Files.createTempDirectory("graft_in").toString
    val tmpOut = java.nio.file.Files.createTempDirectory("graft_out").toString
    // no hot pixels: a single 50000-count outlier dominates the norms and
    // makes frame-to-frame cosine meaningless for this assertion
    (1 to 2).foreach { no =>
      val px = SyntheticFrame.frame(spark, cal, no, nHotPer10k = 0)
        .collect()
      val m = Array.ofDim[Int](96, 96)
      px.foreach(r => m(r.getInt(1))(r.getInt(2)) = r.getInt(3))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(f"$tmpIn/synth-${no}%05d.tif"),
        FrameSource.encodeTiff(m))
    }

    val q = StreamingPipeline.start(spark, tmpIn, tmpOut, cal, geo,
      availableNow = true)
    q.awaitTermination(300000)

    val integrals = spark.read.parquet(s"$tmpOut/integrals")
    assert(integrals.select(col("frame_no")).distinct().count() == 2)
    assert(integrals.where(col("i_base").isNotNull).count() > 100)
    assert(integrals.select(col("dataset")).distinct().collect()
      .map(_.getString(0)).toSeq == Seq("synth"))
    val spotty = spark.read.parquet(s"$tmpOut/spottiness")
    assert(spotty.count() > 0)
    val csim = spark.read.parquet(s"$tmpOut/csim")
      .orderBy(col("frame_no")).collect()
    assert(csim.length == 2)
    assert(math.abs(csim(0).getAs[Double]("csim_prev") - 1.0) < 1e-9)
    // frame 2 differs from frame 1 only by noise/hot pixels: similar but
    // not identical
    assert(csim(1).getAs[Double]("csim_prev") < 1.0 + 1e-9)
    assert(csim(1).getAs[Double]("csim_first") > 0.5)
  }
}
