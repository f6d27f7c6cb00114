package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.SyntheticFrame
import graft.geometry.Geometry
import graft.pipeline.FramePipeline

/** Interleaved A/B for the shared A8+A9 Q-bin stats pass (dev tool):
  * the shipped ObjectHashAggregate median/MAD ([[graft.ops.MedianMadAgg]])
  * vs the sort-based streaming kernel ([[graft.ops.SortedMedianMad]]),
  * inside the full qbinAggregate shape (moments + median/MAD + spot
  * count). Results are asserted EQUAL before a pair counts; legs run
  * back-to-back in one JVM (the only valid protocol on this host —
  * SCALE_r05.md).
  *
  *   sbt "runMain graft.tools.QbinBench [nFrames] [size] [pairs]"
  */
object QbinBench {
  def main(args: Array[String]): Unit = {
    val nFrames = if (args.length > 0) args(0).toInt else 4
    val size = if (args.length > 1) args(1).toInt else 1440
    val pairs = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "1200s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cal = SyntheticFrame.testCalibration(size)
    val (h, w) = cal.imageSize
    val px0 = (1 to nFrames).map(no =>
      SyntheticFrame.frame(spark, cal, no, nHotPer10k = 2,
        spots = Seq((size / 3, size / 3, 30000.0, 3.0)),
        arcs = Seq((5.5, 20.0, 160.0, 9000.0))))
      .reduce(_ unionByName _).localCheckpoint(true)
    val core = FramePipeline.flagOutliersInline(px0, cal)
      .select(col("frame_no"), col("y"), col("x"), col("corr_i"),
        col("corr"), col("base_mask"), col("is_outlier"))
      .localCheckpoint(true)
    val fused = graft.stencil.Stencil.secondDirectionalDerivNarrowRaw(
        core, w, h, Geometry.scalarPixelGeoFull(cal),
        Geometry.scalarPixelHats(cal), tile = 512)
      .localCheckpoint(true)
    val narrow = fused.drop("grad2_r")
      .withColumn("frame_no", col("frame_no").cast("int"))
    val gradBoth = fused.select(col("frame_no"), col("y"), col("x"),
      col("grad2_r"), col("grad2_a"), col("q_bin"))
    val flags = graft.pipeline.Classification.classify(narrow, w, h,
        Seq("frame_no"), graft.pipeline.Classification.Params(),
        d2Precomputed = Some(gradBoth), cal = Some(cal))
      .localCheckpoint(true)
    // the same pixel table process() feeds qbinAggregate
    val px = narrow.join(broadcast(flags.select(col("frame_no"), col("y"),
        col("x"), col("label"), col("is_spot"), col("is_arc"))),
        Seq("frame_no", "y", "x"), "left")
      .withColumn("is_spot", coalesce(col("is_spot"), lit(false)))
      .withColumn("is_arc", coalesce(col("is_arc"), lit(false)))
      .localCheckpoint(true)
    println(s"[qbin] pixel rows = ${px.count()}, " +
      s"groups = ${px.select(col("frame_no"), col("q_bin")).distinct.count()}")

    def run(mmForm: String): (Double, Array[org.apache.spark.sql.Row]) = {
      val t0 = System.nanoTime()
      val out = FramePipeline.qbinAggregate(px, medianForm = mmForm)
      val rows = out.orderBy("frame_no", "q_bin").collect()
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    def fingerprint(rows: Array[org.apache.spark.sql.Row]): String =
      rows.map(_.toSeq.map {
        case d: Double => f"$d%.9e"
        case v => String.valueOf(v)
      }.mkString(",")).mkString("|").hashCode.toHexString

    var ra = List.empty[Double]; var rb = List.empty[Double]
    for (i <- 1 to pairs) {
      val (ta, rowsA) = run("agg")
      val (tb, rowsB) = run("sorted")
      val (fa, fb) = (fingerprint(rowsA), fingerprint(rowsB))
      require(fa == fb, s"A/B mismatch: $fa vs $fb")
      println(f"[qbin] pair $i: agg $ta%7.2f s  sorted $tb%7.2f s  " +
        f"ratio ${ta / tb}%5.2fx  (rows ${rowsA.length}, fp $fa)")
      ra ::= ta; rb ::= tb
    }
    val geo = math.exp(
      ra.zip(rb).map { case (a, b) => math.log(a / b) }.sum / pairs)
    println(f"[qbin] geomean agg/sorted = $geo%5.2fx over $pairs pairs")
    spark.stop()
  }
}
