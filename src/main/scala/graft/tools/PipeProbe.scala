package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.SyntheticFrame
import graft.geometry.Geometry
import graft.pipeline.{Classification, FramePipeline}
import graft.stencil.{CCL, Morphology}

/** Stage-by-stage timing probe for the frame pipeline (dev tool). */
object PipeProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(192)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val cal = SyntheticFrame.testCalibration(n)
    val geo = t("geometry")(Geometry.build(spark, cal).localCheckpoint(true))
    val frame = t("frame")(SyntheticFrame.frame(spark, cal, 1,
      nHotPer10k = 0,
      spots = Seq((60, 80, 20000.0, 2.0), (120, 40, 20000.0, 2.0)),
      arcs = Seq((8.0, 30.0, 150.0, 8000.0))).localCheckpoint(true))

    val flagged = t("flagOutliers")(
      FramePipeline.flagOutliers(frame, geo).localCheckpoint(true))
    println("[probe] outliers=" + flagged.where(col("is_outlier")).count())

    val keys = Seq("frame_no")
    val outlierPx = flagged.where(col("is_outlier"))
      .select(col("frame_no"), col("y"), col("x"))
    val closed = t("closing")(
      Morphology.closing(outlierPx, 1, keys, n, n).localCheckpoint(true))
    println("[probe] closed=" + closed.count())
    val labeled0 = t("CCL")(CCL.label(closed, n, keys))
    println("[probe] clusters=" + labeled0.select(countDistinct(col("label")))
      .collect()(0).getLong(0))
    val labeled = labeled0.join(flagged.select(col("frame_no"), col("y"),
      col("x"), col("q"), col("azim"), col("azim_flipped")),
      Seq("frame_no", "y", "x")).localCheckpoint(true)
    val shaped = t("shapeClassify")(
      Classification.shapeClassify(labeled, keys).localCheckpoint(true))
    shaped.groupBy(col("classifier")).count().show()
    val labeledFull = labeled.join(broadcast(shaped),
      Seq("frame_no", "label")).localCheckpoint(true)
    val flags = t("gradientRefine")(
      Classification.gradientRefine(flagged, labeledFull, n, n, keys)
        .localCheckpoint(true))
    println("[probe] spots=" + flags.where(col("is_spot")).count() +
      " arcs=" + flags.where(col("is_arc")).count())
    spark.stop()
  }
}
