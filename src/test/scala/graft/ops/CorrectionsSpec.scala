package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorrectionsSpec extends SparkSpec {
  import spark.implicits._

  test("correction chain: dark, gain, flat background, flat field") {
    val px = Seq((1, 0, 0, 1000), (1, 0, 1, 2000)).toDF(
      "frame_no", "y", "x", "intensity")
    val dark = Seq((0, 0, -50.0), (0, 1, -100.0)).toDF("y", "x", "value")
    val gain = Seq((0, 0, 1100.0), (0, 1, 1000.0)).toDF("y", "x", "value")
    val ff = Seq((0, 0, 2.0), (0, 1, 0.5)).toDF("y", "x", "value")
    val out = Corrections(px,
        dark = Some((dark, 1.0)), gainMap = Some(gain), flatBkg = 10.0,
        flatField = Some(ff))
      .orderBy(col("x")).select(col("corr_i")).collect()
      .map(_.getDouble(0)).toSeq
    // px0: (1000 - 50) * 1.1 - 10 = 1035, * 2.0 = 2070
    // px1: (2000 - 100) * 1.0 - 10 = 1890, * 0.5 = 945
    assert(out == Seq(2070.0, 945.0))
  }

  test("missing correction pixels fall back to identity") {
    val px = Seq((1, 5, 5, 100)).toDF("frame_no", "y", "x", "intensity")
    val dark = Seq((0, 0, -50.0)).toDF("y", "x", "value") // no (5,5)
    val out = Corrections(px, dark = Some((dark, 1.0)),
        gainMap = Some(dark.limit(0)))
      .select(col("corr_i")).collect()(0).getDouble(0)
    assert(out == 100.0)
  }
}
