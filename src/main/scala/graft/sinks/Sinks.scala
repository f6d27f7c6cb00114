package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Output writers. Parquet tables are canonical (transactional commits make
  * the reference's mtime-debounce and drop-last-file hacks obsolete —
  * SURVEY §2.11); the `.chi` / csv text formats are compatibility codecs
  * for the reference's UI (Export_chi pipeline.py:44-52).
  */
object Sinks {

  /** Canonical sink: partitioned parquet per table. Partitioning by
    * dataset keeps 100 TB of output prunable by the UI's standing
    * queries. */
  def writeTable(df: DataFrame, outDir: String, name: String,
                 partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("append")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(s"$outDir/$name")
  }

  /** `.chi` text codec (reference Export_chi pipeline.py:44-52): header of
    * 4 lines, then "% .7e  % .7e" (2-theta, intensity) rows. Returns the
    * file body; caller writes it next to the frame outputs. */
  def chiBody(sourceName: String, rows: Seq[(Double, Double)]): String = {
    val sb = new StringBuilder
    sb.append(s"$sourceName Azm= 0.00\n")
    sb.append("2-Theta Angle (Degrees)\n")
    sb.append("Intensity\n")
    sb.append(f"${rows.length}%11d\n")
    rows.foreach { case (t, i) =>
      sb.append(f" $t%.7e   $i%.7e\n")
    }
    sb.toString
  }

  /** Write one `.chi` file per (frame, variant) from the integral table.
    * When `dense` gives (nChannels, tthLo, tthStep), empty channels are
    * emitted as zeros so every file has exactly nChannels rows (the
    * reference's bincount output is dense, pipeline.py:69-72). */
  def writeChi(integrals: DataFrame, outDir: String, variant: String,
               dense: Option[(Int, Double, Double)] = None): Unit = {
    val rows = integrals
      .select(col("frame_no"), col("tth_bin"), col("tth"),
        col(s"i_$variant"))
      .na.fill(0.0, Seq(s"i_$variant"))
      .orderBy(col("frame_no"), col("tth_bin"))
      .collect()
    new java.io.File(outDir).mkdirs()
    rows.groupBy(_.getInt(0)).foreach { case (frame, rs) =>
      val series = dense match {
        case Some((n, lo, step)) =>
          val present = rs.map(r => r.getInt(1) -> r.getDouble(3)).toMap
          (0 until n).map(b => (lo + (b + 0.5) * step,
            present.getOrElse(b, 0.0)))
        case None =>
          rs.toSeq.map(r => (r.getDouble(2), r.getDouble(3)))
      }
      val body = chiBody(f"frame-$frame%05d.tif", series)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(f"$outDir/frame-$frame%05d_$variant.chi"),
        body)
    }
  }

  /** csim text sink: "%0.9f\t%0.9f" per frame (reference
    * pipeline.py:554-557). */
  def csimBody(vsFirst: Double, vsPrev: Double): String =
    f"$vsFirst%.9f\t$vsPrev%.9f"

  /** Q-bin-edges dimension table, once per dataset (reference S14:
    * `<dataset>_qbinedges.npy`, pipeline.py:493-497). */
  def writeQBinEdges(spark: org.apache.spark.sql.SparkSession,
                     cal: graft.core.Calibration, outDir: String,
                     dataset: String): Unit = {
    import spark.implicits._
    cal.qBinEdges.zipWithIndex
      .map { case (q, i) => (dataset, i, q) }.toSeq
      .toDF("dataset", "edge_idx", "q")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/q_bin_edges/dataset=$dataset")
  }
}
