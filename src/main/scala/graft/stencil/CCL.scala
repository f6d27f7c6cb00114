package graft.stencil

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected-component labeling over sparse pixel sets.
  *
  * Reference: scipy.ndimage.label / skimage.measure.label over the outlier
  * and gradient masks (classification.py:387,563; spottiness.py:31). Masked
  * pixels are a small fraction of the frame, so we label only the ACTIVE
  * rows (keys..., y, x) — `keys` (e.g. frame_no) scope independent frames
  * labeled in the same pass.
  *
  * Algorithm: min-label propagation with pointer jumping —
  *  1. node id = y * width + x, initial label = own id;
  *  2. edge list = 8- (or 4-) neighbour pairs among active pixels, built
  *     with equi-joins on shifted coordinates (no cartesian product);
  *  3. iterate: label <- min(label, min over neighbours' labels), then
  *     pointer-jump (label <- label's label) to collapse chains
  *     exponentially; stop when no label changes.
  *
  * Converges in O(log(diameter)) rounds thanks to the pointer jumping;
  * every round is a pair of hash joins + aggregations — shuffle-bound, no
  * driver data movement except the convergence counter. Final labels are
  * DETERMINISTIC: the min pixel id of the component (invariant to
  * partitioning — property-tested against a single-node union-find).
  *
  * Returns the input (keys..., y, x) rows + a `label` column (long).
  */
object CCL {

  def label(active: DataFrame, width: Int, keys: Seq[String] = Nil,
            eightConnected: Boolean = true, maxIter: Int = 50): DataFrame = {
    val kcols = keys.map(col)
    val pid = col("y").cast("long") * width + col("x")

    // localCheckpoint (not cache): the loop below would otherwise nest the
    // whole lineage each round and blow up plan compilation.
    var nodes = active
      .select(kcols :+ col("y") :+ col("x") :+ pid.as("id"): _*)
      .withColumn("label", col("id"))
      .localCheckpoint(true)

    // Neighbour edges among active pixels: equi-join on shifted coords,
    // scoped by the frame keys. Forward offsets only, then symmetrized.
    val offs = if (eightConnected) Seq((0, 1), (1, -1), (1, 0), (1, 1))
               else Seq((0, 1), (1, 0))
    val a = nodes.select(kcols ++ Seq(col("y"), col("x"),
      col("id").as("id_a")): _*)
    val bb = nodes.select(keys.map(k => col(k).as(s"_k_$k")) ++
      Seq(col("y").as("by"), col("x").as("bx"), col("id").as("id_b")): _*)
    val keyCond = keys.map(k => col(k) === col(s"_k_$k"))
      .foldLeft(lit(true))(_ && _)
    val edgesRaw = offs.map { case (dy, dx) =>
      a.join(bb, keyCond &&
          col("by") === col("y") + dy && col("bx") === col("x") + dx)
        .select(kcols ++ Seq(col("id_a"), col("id_b")): _*)
    }.reduce(_ union _)
    val edges = edgesRaw.union(edgesRaw.select(
        kcols ++ Seq(col("id_b").as("id_a"), col("id_a").as("id_b")): _*))
      .localCheckpoint(true)

    val keyJoin = keys.toSeq // join column names shared across frames
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(nodes.select(kcols ++ Seq(col("id").as("id_b"),
          col("label").as("lb")): _*), keyJoin :+ "id_b")
        .groupBy(kcols :+ col("id_a"): _*)
        .agg(min(col("lb")).as("nmin"))
        .withColumnRenamed("id_a", "id")
      val stepped = nodes
        .join(nbrMin, keyJoin :+ "id", "left")
        .select(kcols ++ Seq(col("y"), col("x"), col("id"),
          least(col("label"), coalesce(col("nmin"), col("label")))
            .as("label")): _*)
      // pointer jumping: label <- label(label), scoped by keys
      val lut = stepped.select(keys.map(k => col(k).as(s"_k_$k")) ++
        Seq(col("id").as("lid"), col("label").as("llabel")): _*)
      val jumped = stepped
        .join(lut, keyCond && stepped("label") === lut("lid"), "left")
        .select(kcols ++ Seq(col("y"), col("x"), col("id"),
          coalesce(col("llabel"), col("label")).as("label")): _*)
        .localCheckpoint(true)
      val changed = jumped
        .join(nodes.select(kcols ++ Seq(col("id"),
          col("label").as("olabel")): _*), keyJoin :+ "id")
        .where(col("label") =!= col("olabel")).limit(1).count()
      nodes = jumped
      converged = changed == 0
      iter += 1
    }
    nodes.drop("id")
  }
}
