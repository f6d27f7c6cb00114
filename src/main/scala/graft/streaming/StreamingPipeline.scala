package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core.Calibration
import graft.pipeline.FramePipeline
import graft.sinks.Sinks
import graft.sources.FrameSource

/** The streaming driver (reference pipeline_queue.py:631-942: watchdog +
  * deque + one worker thread, one frame in flight).
  *
  * Spark-first: a `binaryFile` stream feeds `foreachBatch`; every
  * micro-batch decodes and processes ALL its frames through the one
  * per-frame plan keyed by frame_no — frames parallelize across the
  * cluster, which the reference explicitly leaves on the table
  * (pipeline_queue.py:745-746 "Should set these up with a pool").
  * Checkpointing + transactional parquet sinks replace the reference's
  * mtime-debounce and drop-last-file consistency hacks (SURVEY §2.11).
  * Backfill of pre-existing files (reference S2) is the same query run
  * with Trigger.AvailableNow.
  */
object StreamingPipeline {

  /** Start the live pipeline over a detector directory. Pause/resume =
    * stop/start with the same checkpoint (reference pause button,
    * pipeline_queue.py:944-1062). */
  def start(spark: SparkSession, inDir: String, outDir: String,
            cal: Calibration, geometry: DataFrame,
            availableNow: Boolean = false,
            maxFilesPerTrigger: Int = 32): StreamingQuery = {
    val frames = FrameSource.stream(spark, inDir,
      maxFilesPerTrigger = maxFilesPerTrigger,
      debounceSeconds = if (availableNow) 0 else 1)
    val writer = frames.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, outDir, cal, geometry)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("1 second")))
      .start()
  }

  /** One micro-batch: decode → per-frame plan → sinks. Datasets are
    * processed separately (frame_no is only unique within a dataset). */
  def processBatch(batch: DataFrame, outDir: String, cal: Calibration,
                   geometry: DataFrame): Unit = {
    if (batch.isEmpty) return
    val datasets = batch.select(col("dataset")).distinct()
      .collect().map(_.getString(0))
    datasets.foreach { ds =>
      val px = FrameSource.toPixels(batch.where(col("dataset") === ds))
        .drop("dataset")
      val out = FramePipeline.process(px, geometry, cal)
      val tag = lit(ds).as("dataset")
      Sinks.writeTable(out.integrals.withColumn("dataset", tag),
        outDir, "integrals", Seq("dataset"))
      Sinks.writeTable(out.spotStats.withColumn("dataset", tag),
        outDir, "spot_stats", Seq("dataset"))
      Sinks.writeTable(out.gradStats.withColumn("dataset", tag),
        outDir, "grad_stats", Seq("dataset"))
      Sinks.writeTable(out.spottiness.withColumn("dataset", tag),
        outDir, "spottiness", Seq("dataset"))
      // A11: similarity series over the corrected frames of this batch
      // (vs-first/vs-prev within the batch; reference pipeline.py:506-557)
      val vecs = out.pixels.where(!col("base_mask"))
        .select(lit(ds).as("dataset"), col("frame_no"), col("y"), col("x"),
          col("corr").as("v"))
      Sinks.writeTable(graft.ops.Csim.series(vecs), outDir, "csim",
        Seq("dataset"))
    }
  }
}
