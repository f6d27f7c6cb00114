package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Frame-to-frame cosine similarity series (reference pipeline.py:506-557:
  * csim vs the FIRST and the PREVIOUS frame of the dataset, first frame
  * comparing to itself).
  *
  * The reference re-reads the previous/first image from disk per frame
  * (J5); here both are equi-joins on (y, x) between adjacent frames — the
  * norms are per-frame aggregates and the cross terms one join each, all in
  * two shuffles regardless of frame count. Frames are identified by an
  * integer `frame_no` within a `dataset` partition column.
  *
  * Gap semantics are DELIBERATELY filename-arithmetic, like the reference:
  * `pipeline.py:508-523` reads file `number-1` and, when it does not exist
  * (a skipped/unreadable frame), falls back to comparing the current image
  * with ITSELF — csim_prev = 1.0. The `coalesce(..., 1.0)` below reproduces
  * exactly that, so after a quarantined frame N, frame N+1 reports 1.0 just
  * as the reference would. Do not "fix" this into last-processed-frame
  * semantics; that would diverge from the reference output.
  */
object Csim {

  /** Input: (dataset, frame_no, y, x, v). Output per frame:
    * (dataset, frame_no, csim_first, csim_prev). */
  def series(px: DataFrame): DataFrame = {
    val norms = px.groupBy(col("dataset"), col("frame_no"))
      .agg(sum(col("v") * col("v")).as("n2"))

    val firstNo = px.groupBy(col("dataset"))
      .agg(min(col("frame_no")).as("first_no"))

    val cur = px.select(col("dataset"), col("frame_no"), col("y"), col("x"),
      col("v"))
    val prev = px.select(col("dataset"),
      (col("frame_no") + 1).as("frame_no"), col("y"), col("x"),
      col("v").as("v_prev"))
    val crossPrev = cur.join(prev, Seq("dataset", "frame_no", "y", "x"))
      .groupBy(col("dataset"), col("frame_no"))
      .agg(sum(col("v") * col("v_prev")).as("dot_prev"))

    val firstPx = px.join(broadcast(firstNo), "dataset")
      .where(col("frame_no") === col("first_no"))
      .select(col("dataset"), col("y"), col("x"), col("v").as("v_first"))
    val crossFirst = cur.join(firstPx, Seq("dataset", "y", "x"))
      .groupBy(col("dataset"), col("frame_no"))
      .agg(sum(col("v") * col("v_first")).as("dot_first"))

    val firstNorm = norms.join(broadcast(firstNo), "dataset")
      .where(col("frame_no") === col("first_no"))
      .select(col("dataset"), col("n2").as("n2_first"))
    val prevNorm = norms.select(col("dataset"),
      (col("frame_no") + 1).as("frame_no"), col("n2").as("n2_prev"))

    norms
      .join(crossFirst, Seq("dataset", "frame_no"), "left")
      .join(crossPrev, Seq("dataset", "frame_no"), "left")
      .join(broadcast(firstNorm), Seq("dataset"))
      .join(prevNorm, Seq("dataset", "frame_no"), "left")
      .select(col("dataset"), col("frame_no"),
        coalesce(col("dot_first") /
          (sqrt(col("n2")) * sqrt(col("n2_first"))), lit(1.0))
          .as("csim_first"),
        // first frame of a dataset compares to itself => 1.0
        coalesce(col("dot_prev") /
          (sqrt(col("n2")) * sqrt(col("n2_prev"))), lit(1.0))
          .as("csim_prev"))
  }
}
