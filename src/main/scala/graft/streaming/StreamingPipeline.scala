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
    * pipeline_queue.py:944-1062).
    *
    * `debounceSeconds` is the streaming form of the reference's mtime
    * debounce (S4, pipeline_queue.py:740): the micro-batch is HELD until
    * its youngest file is at least that old, then processed — a file
    * caught mid-write gets its final bytes (binaryFile reads content at
    * task execution, after the wait). A row-level drop like the batch
    * `FrameSource.debounceFilter` would lose young files permanently
    * here (the source marks files processed at listing), so the wait is
    * the only loss-free streaming semantics. With checkpointed
    * transactional sinks plus the decode quarantine it is strictly
    * optional — the reference needs its debounce only because its sinks
    * are not transactional. */
  def start(spark: SparkSession, inDir: String, outDir: String,
            cal: Calibration, geometry: DataFrame,
            availableNow: Boolean = false,
            maxFilesPerTrigger: Int = 32,
            predef: Seq[graft.core.MaskShape] = Nil,
            corrections: graft.ops.Corrections.Frames =
              graft.ops.Corrections.Frames(),
            referenceBinShift: Boolean = false,
            debounceSeconds: Option[Int] = None): StreamingQuery = {
    val frames = FrameSource.stream(spark, inDir,
      maxFilesPerTrigger = maxFilesPerTrigger)
    val writer = frames.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, outDir, cal, geometry, predef, corrections,
          referenceBinShift, debounceSeconds)
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime("1 second")))
      .start()
  }

  /** Milliseconds a batch whose youngest file has `newestMtimeMs` must
    * still wait to honor an S4 debounce of `seconds` (0 = old enough). */
  private[streaming] def debounceWaitMs(newestMtimeMs: Long, seconds: Int,
                                        nowMs: Long): Long =
    math.max(0L, newestMtimeMs + seconds * 1000L - nowMs)

  /** One micro-batch: decode → per-frame plan → sinks. Datasets are
    * processed separately (frame_no is only unique within a dataset). */
  def processBatch(batch: DataFrame, outDir: String, cal: Calibration,
                   geometry: DataFrame,
                   predef: Seq[graft.core.MaskShape] = Nil,
                   corrections: graft.ops.Corrections.Frames =
                     graft.ops.Corrections.Frames(),
                   referenceBinShift: Boolean = false,
                   debounceSeconds: Option[Int] = None): Unit = {
    if (batch.isEmpty) return
    debounceSeconds.foreach { secs =>
      val newest = batch.agg(max(col("modificationTime"))).head()
      if (!newest.isNullAt(0)) {
        val wait = debounceWaitMs(newest.getTimestamp(0).getTime, secs,
          System.currentTimeMillis())
        if (wait > 0) Thread.sleep(wait)
      }
    }
    val datasets = batch.select(col("dataset")).distinct()
      .collect().map(_.getString(0))
    // Bounded executor storage across an unbounded stream: every
    // localCheckpoint this batch pins (decode, the process() interiors,
    // stats tables, csim state) is dead once its sinks committed. The
    // ContextCleaner would reclaim them eventually, but only after a
    // driver GC notices the weak references — under a large driver heap
    // that lag spans many batches of pinned full-frame blocks and shows
    // up as storage-eviction pressure. Releasing everything the batch
    // pinned (and nothing that predates it — the per-calibration
    // geometry checkpoint survives) keeps the steady-state footprint at
    // exactly one batch.
    val sc = batch.sparkSession.sparkContext
    val preexisting = sc.getPersistentRDDs.keySet
    try
      datasets.foreach(ds =>
        processDataset(batch, ds, outDir, cal, geometry, predef,
          corrections, referenceBinShift))
    finally
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!preexisting.contains(id)) rdd.unpersist(blocking = false)
      }
  }

  /** Canonical parquet tables live under `outDir/tables/<name>`; the
    * reference-shaped text/TIFF tree (.chi files under `integrals`, mask
    * TIFFs under `masks`, csim text under `stats`) sits at `outDir` top
    * level exactly where the reference UI's globs expect it
    * (mainUI contour.py:170-186, csim.py:48-64), with every file named
    * `<dataset>-<number>_<suffix>` from the real acquisition stem. */
  private[streaming] def tablesDir(outDir: String): String = s"$outDir/tables"

  /** Decode → per-frame plan → sinks for one dataset of one micro-batch. */
  private def processDataset(batch: DataFrame, ds: String, outDir: String,
                             cal: Calibration, geometry: DataFrame,
                             predef: Seq[graft.core.MaskShape],
                             corrections: graft.ops.Corrections.Frames,
                             referenceBinShift: Boolean = false)
      : Unit = {
      // A14: per-stage wall times for this batch, appended to the timing
      // table at the end (reference pipeline_queue.py:1010-1014)
      val times = scala.collection.mutable.ArrayBuffer
        .empty[(String, Double)]
      def timed[T](stage: String)(f: => T): T =
        graft.ops.Timing.timed(stage, times)(f)
      // One decode pass per batch: quarantine sentinel rows (y = -1 marks
      // an undecodable payload — e.g. a file caught mid-write) split off
      // here; the checkpoint bounds memory at maxFilesPerTrigger frames.
      val pxAll = timed("decode")(
        FrameSource.toPixels(batch.where(col("dataset") === ds))
          .drop("dataset").localCheckpoint(true))
      val bad = pxAll.where(col("y") === -1)
        .select(col("frame_no"), lit(ds).as("dataset"))
      if (!bad.isEmpty)
        Sinks.writeTable(bad, tablesDir(outDir), "quarantine", Seq("dataset"))
      val px = pxAll.where(col("y") >= 0)
      // A batch can contribute no decodable pixels at all — e.g. its only
      // file is caught mid-write (quarantined above). Skip the dataset for
      // this batch instead of running the pipeline on an empty frame set;
      // the reference simply never processes a frame it cannot read.
      if (px.isEmpty) return
      // referenceBinShift: opt-in label-compatible .chi binning for users
      // pointing the reference UI at this output (FramePipeline binning
      // note at the integrate stage)
      // EAGER inside (core/fused/flags checkpoints + the flag-count
      // gate): the bulk of per-batch wall lands here, so time it — the
      // r5-noted "untimed cost between timed stages" was exactly this
      // call (A14 parity: the reference's corrections/outlier/closing/
      // classification stage block, pipeline_queue.py:1010-1014)
      val out = timed("frame_plan")(
        FramePipeline.process(px, geometry, cal, predef = predef,
          corrections = corrections, referenceBinShift = referenceBinShift))
      val tag = lit(ds).as("dataset")
      // S14: the q-bin-edges dimension table, once per dataset
      // (reference writes <dataset>_qbinedges once, pipeline.py:493-497)
      if (!graft.core.Fs.exists(
          s"${tablesDir(outDir)}/q_bin_edges/dataset=$ds",
          graft.core.Fs.conf(batch.sparkSession)))
        Sinks.writeQBinEdges(batch.sparkSession, cal, tablesDir(outDir), ds)
      // per-calibration geometry map TIFFs under outDir/maps (reference
      // cache_creation.py:66-84 writes them once; the UI globs
      // maps/*_2thetamap.tif). Keyed on the dataset stem.
      val (imgHM, imgWM) = cal.imageSize
      if (!graft.core.Fs.exists(s"$outDir/maps/${ds}_2thetamap.tif",
          graft.core.Fs.conf(batch.sparkSession)))
        timed("sink_maps_cache")(Sinks.writeMapTiffs(geometry, imgWM, imgHM,
          s"$outDir/maps", ds))
      // pixels feed two sinks (mask TIFFs + csim) and integrals feed two
      // (.chi + parquet): pin each once so the full per-frame plan does
      // not re-execute per sink
      // only the columns the two pixel sinks (mask TIFFs, csim) read —
      // the full-width pixel table is ~3x this checkpoint's footprint
      val pixels = timed("process")(out.pixels
        .select(col("frame_no"), col("y"), col("x"), col("corr"),
          col("base_mask"), col("is_outlier"), col("is_spot"),
          col("is_arc"))
        .localCheckpoint(true))
      val integrals = out.integrals.localCheckpoint(true)
      timed("sink_integrals")(
        Sinks.writeTable(integrals.withColumn("dataset", tag),
          tablesDir(outDir), "integrals", Seq("dataset")))
      // S12: per-frame .chi files for the reference UI, executor-side —
      // all four variants like the reference (pipeline.py:421-449)
      timed("sink_chi")(
        Seq("base", "om", "spotsmasked", "arcsmasked").foreach { v =>
          Sinks.writeChi(integrals, s"$outDir/integrals", v,
            dense = Some((cal.outChannels, cal.ioTth._1, cal.tthStep)),
            dataset = ds)
        })
      // S11: per-frame mask TIFFs (reference pipeline.py:152-332)
      val (imgH, imgW) = cal.imageSize
      timed("sink_masks")(
        Sinks.writeMaskTiffs(pixels, imgW, imgH, s"$outDir/masks", Seq(
          "base" -> col("base_mask"),
          "outliermask" -> (col("base_mask") || col("is_outlier")),
          "spots" -> col("is_spot"),
          "arcs" -> col("is_arc")), dataset = ds))
      // stats tables feed parquet + the reference's per-frame CSVs
      // (pipeline.py:491-492) — pin each so the plan runs once. The
      // checkpoint is where the stats plans actually execute, so time it
      // (A14 stage parity: "Save stats" in the reference's printout).
      // A8 and A9 are projections of the SHARED per-(frame, q_bin)
      // aggregate (FrameOutputs.qbinStats): materializing that one table
      // runs the pixel scan once where checkpointing gradStats and
      // spottiness separately re-ran it per family.
      val (spotStats, qbinStats) = timed("stats") {
        (out.spotStats.localCheckpoint(true),
          out.qbinStats.localCheckpoint(true))
      }
      val gradStats = FramePipeline.gradStatsOf(qbinStats)
      timed("sink_stats_tables") {
        Sinks.writeTable(spotStats.withColumn("dataset", tag),
          tablesDir(outDir), "spot_stats", Seq("dataset"))
        Sinks.writeTable(gradStats.withColumn("dataset", tag),
          tablesDir(outDir), "grad_stats", Seq("dataset"))
      }
      timed("sink_stats_csv") {
        val frameNos = integrals.select(col("frame_no")).distinct()
          .collect().map(_.getInt(0)).toSeq
        // row order = the reference's pandas groupby key, so the 0-based
        // index column matches the reference CSVs
        Sinks.writeFrameCsv(spotStats, s"$outDir/stats",
          "_spots_stats_df", ds, frameNos,
          orderCols = Seq("spot_stat_label"))
        Sinks.writeFrameCsv(gradStats, s"$outDir/stats",
          "_spots_stats_grad", ds, frameNos, orderCols = Seq("Qbin"))
      }
      timed("spottiness")(
        Sinks.writeTable(FramePipeline.spottinessOf(qbinStats)
          .withColumn("dataset", tag),
          tablesDir(outDir), "spottiness", Seq("dataset")))
      // A11: similarity series vs the dataset's FIRST frame and the
      // immediately PREVIOUS frame, ACROSS micro-batches (reference
      // pipeline.py:506-557). Cross-batch state = a tiny parquet table per
      // dataset holding the pixels of exactly two frames: the dataset's
      // first and the last frame seen so far. Each batch unions that
      // state with its own frames, runs the batch csim plan, keeps the
      // rows for its own frames, and rolls the state forward.
      val vecs = pixels.where(!col("base_mask"))
        .select(lit(ds).as("dataset"), col("frame_no"), col("y"), col("x"),
          col("corr").as("v"))
      timed("csim")(writeCsimStateful(vecs, outDir, ds))
      graft.ops.Timing.write(batch.sparkSession, tablesDir(outDir), ds,
        times.toSeq)
  }

  /** Compute and append this batch's csim rows using (and advancing) the
    * persisted first/prev frame state at `outDir/_state/csim/<ds>`. */
  private[streaming] def writeCsimStateful(vecs: DataFrame, outDir: String,
                                           ds: String): Unit = {
    val spark = vecs.sparkSession
    val statePath = s"$outDir/_state/csim/$ds"
    // state schema: (dataset, frame_no, y, x, v) for the retained frames
    // (dataset-first and latest); read fully materialized so the
    // overwrite below cannot race the read
    val state = if (graft.core.Fs.exists(statePath, graft.core.Fs.conf(spark)))
      Some(spark.read.parquet(statePath).localCheckpoint(true))
    else None
    val batchVecs = vecs.localCheckpoint(true)

    // A batch can contribute no vectors even when it had decodable files —
    // e.g. a shutter-closed frame whose every pixel is base-masked (all
    // non-positive). The max()/min() reads below would then return null
    // rows and NPE, and the state overwrite would wipe the retained
    // first/prev frames. Skip csim for such a batch and leave state as-is.
    val lastRow = batchVecs.agg(max(col("frame_no"))).head()
    if (lastRow.isNullAt(0)) return
    val lastNo = lastRow.getInt(0)

    val batchFrames = batchVecs.select(col("frame_no")).distinct()
    // state frames re-delivered in this batch (shouldn't happen under
    // exactly-once file semantics, but cheap to guard) are dropped via a
    // broadcast anti-join on the tiny frame list — NOT a row-level
    // distinct, which would shuffle every pixel of state + batch.
    val union = state.map(_.join(broadcast(batchFrames), Seq("frame_no"),
        "left_anti").unionByName(batchVecs)).getOrElse(batchVecs)
    val series = graft.ops.Csim.series(union)
      .join(batchFrames, "frame_no") // emit only this batch's frames
      .select(col("dataset"), col("frame_no"), col("csim_first"),
        col("csim_prev"))
      .localCheckpoint(true) // two sinks below: compute the plan once
    Sinks.writeTable(series, tablesDir(outDir), "csim", Seq("dataset"))
    // S15: the per-frame text files the reference UI actually reads
    Sinks.writeCsimTxt(series, s"$outDir/stats")

    // roll state: keep the union's first frame + the batch's max frame
    val firstNo = union.agg(min(col("frame_no"))).head().getInt(0)
    union.where(col("frame_no") === firstNo ||
        col("frame_no") === lastNo)
      .write.mode("overwrite").parquet(statePath)
  }
}
