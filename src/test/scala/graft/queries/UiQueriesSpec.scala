package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

class UiQueriesSpec extends SparkSpec {
  import spark.implicits._

  def integrals(nFrames: Int) =
    (for { f <- 1 to nFrames; b <- 0 until 5 }
      yield ("d", f, b, b * 0.1, 100.0 + b, 90.0 + b, 95.0 + b, 99.0 + b))
      .toDF("dataset", "frame_no", "tth_bin", "tth",
        "i_base", "i_om", "i_spotsmasked", "i_arcsmasked")

  test("contour stride caps the number of sampled frames") {
    val out = UiQueries.contour(integrals(450), "om", maxLines = 100)
    val frames = out.select(col("frame_no")).distinct().count()
    assert(frames <= 100 && frames >= 80)
    // stride sampling keeps the first frame
    assert(out.where(col("frame_no") === 1).count() == 5)
    // small datasets pass through unsampled
    val small = UiQueries.contour(integrals(20), "om", maxLines = 100)
    assert(small.select(col("frame_no")).distinct().count() == 20)
  }

  test("integralDiffs are base minus variant") {
    val out = UiQueries.integralDiffs(integrals(1)).collect()
    assert(out.forall(r => math.abs(r.getAs[Double]("diff_om") - 10.0) < 1e-9))
    assert(out.forall(r => math.abs(r.getAs[Double]("diff_spots") - 5.0) < 1e-9))
  }

  test("gradDerived drops negative Qbins and derives ratio columns") {
    val gs = Seq(("d", 1, -3, 1.0, 2.0, 1.5, 3.0), ("d", 1, 4, 1.0, 2.0, 1.5, 3.0))
      .toDF("dataset", "frame_no", "Qbin", "mean", "std", "median", "mad")
    val out = UiQueries.gradDerived(gs).collect()
    assert(out.length == 1 && out(0).getAs[Int]("Qbin") == 4)
    assert(math.abs(out(0).getAs[Double]("mad_minus_std") - 1.0) < 1e-9)
    assert(math.abs(out(0).getAs[Double]("std_over_mad") - 2.0 / 3.0) < 1e-9)
  }

  test("completedFrames keeps only frames with integrals") {
    val all = Seq(("d", 1), ("d", 2), ("d", 3)).toDF("dataset", "frame_no")
    val out = UiQueries.completedFrames(all, integrals(2)).collect()
      .map(_.getInt(1)).toSet
    assert(out == Set(1, 2))
  }
}
