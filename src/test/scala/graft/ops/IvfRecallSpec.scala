package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Quantifies the IVF (cell-pruned) ANN path's RECALL against the
  * brute-force oracle on data where IVF is appropriate — clustered
  * vectors with the cell = nearest coarse centroid, the assignment a
  * real IVF index uses. `sim_ivf_topk` verifies the MECHANISM
  * (equi-join on the cell key, per-cell ranking) against DuckDB; this
  * spec pins the QUALITY claim: single-probe IVF on well-clustered data
  * recovers most of the true neighbourhood, and the number is measured,
  * not asserted from hope. Seeded generation keeps it deterministic.
  */
class IvfRecallSpec extends SparkSpec {
  import spark.implicits._

  test("single-probe IVF recall@5 on clustered vectors >= 0.8") {
    val dim = 16
    val nCenters = 8
    val perCluster = 50
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val centers = Array.fill(nCenters)(
      unit(Array.fill(dim)(rnd.nextGaussian())))
    def cellOf(v: Array[Double]): Int =
      centers.zipWithIndex.maxBy { case (c, _) =>
        c.zip(v).map { case (a, b) => a * b }.sum
      }._2
    val points = (0 until nCenters).flatMap { c =>
      (0 until perCluster).map { j =>
        val v = unit(centers(c).map(_ + 0.25 * rnd.nextGaussian()))
        (c * perCluster + j, cellOf(v), v)
      }
    }
    val vecs = points.map { case (id, cell, v) => (id.toLong, cell, v) }
      .toDF("vec_id", "cell", "v")
    val queries = vecs.where(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("query_id"), col("cell"),
        col("v").as("qv"))

    def top5(scored: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("cand_id"))
      scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
        .select(col("query_id"), col("cand_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // brute-force oracle: every query against every vector
    val brute = top5(vecs.crossJoin(
        queries.select(col("query_id"), col("qv")))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        VectorOps.cosine(col("qv"), col("v")).as("sim")))
    // IVF: each query probes ONLY its own cell (the sim_ivf_topk shape)
    val ivf = top5(vecs.join(queries, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        VectorOps.cosine(col("qv"), col("v")).as("sim")))

    val recall = (ivf & brute).size.toDouble / brute.size
    info(f"IVF single-probe recall@5 = $recall%.3f " +
      s"(${(ivf & brute).size}/${brute.size})")
    assert(recall >= 0.8,
      f"IVF recall@5 $recall%.3f below 0.8 on clustered data")
    // and the pruning is real: IVF scored far fewer pairs than brute
    val bruteCount = vecs.count() - 1
    val ivfPairs = vecs.join(queries, Seq("cell"))
      .where(col("vec_id") =!= col("query_id")).count()
    assert(ivfPairs < queries.count() * bruteCount / 4,
      "cell pruning should cut the scored pairs by >4x")

    // multi-probe (2 cells, the sim_ivf_multiprobe shape): strictly
    // more candidates, so recall can only improve — and it must still
    // prune (2 of 8 cells). Cells rank by query->centroid cosine.
    val centRows = centers.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq.toDF("cell", "centroid")
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("psim").desc, col("cell"))
    val probes = queries.select(col("query_id"), col("qv"))
      .crossJoin(broadcast(centRows))
      .select(col("query_id"), col("cell"), col("qv"),
        VectorOps.cosine(col("qv"), col("centroid")).as("psim"))
      .withColumn("p", row_number().over(wp)).where(col("p") <= 2)
      .select(col("query_id"), col("cell"), col("qv"))
    val multi = top5(vecs.join(probes, Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        VectorOps.cosine(col("qv"), col("v")).as("sim")))
    val recall2 = (multi & brute).size.toDouble / brute.size
    info(f"IVF 2-probe recall@5 = $recall2%.3f")
    assert(recall2 >= recall,
      f"2-probe recall $recall2%.3f fell below single-probe $recall%.3f")
    val multiPairs = vecs.join(probes, Seq("cell"))
      .where(col("vec_id") =!= col("query_id")).count()
    assert(multiPairs < queries.count() * bruteCount / 2,
      "2-of-8-cell probing should still cut the scored pairs by >2x")
  }
}
