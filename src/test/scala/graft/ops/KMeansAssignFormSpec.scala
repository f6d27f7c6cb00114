package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[KMeans.assignLocal]] (the shuffle-free PqEncodeSig projection
  * [[KMeans.fit]] rides) to [[KMeans.assign]] (the relational
  * window-argmin oracle form) ROW FOR ROW — id, winning centroid and the
  * double distance must all be bit-identical, including on distance
  * ties, non-contiguous centroid ids and an emptied-cluster layout. */
class KMeansAssignFormSpec extends SparkSpec {
  import spark.implicits._

  private def compare(data: Seq[(Long, Seq[Double])],
                      cent: Seq[(Long, Seq[Double])]): Unit = {
    val vecs = data.toDF("vec_id", "v").repartition(5)
    val centDf = cent.toDF("cid", "cv")
    val rel = KMeans.assign(vecs, centDf, "vec_id")
      .select(col("vec_id"), col("cid"), col("d"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val loc = KMeans.assignLocal(vecs, "vec_id", cent)
      .select(col("vec_id"), col("cid"), col("d"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(loc == rel, s"forms diverge: $loc vs $rel")
  }

  test("blobs with non-contiguous centroid ids match the window form") {
    val rnd = new scala.util.Random(11)
    val centers = Seq(Seq(0.0, 0.0, 0.0), Seq(7.0, -3.0, 2.0),
      Seq(-4.0, 5.0, 9.0))
    val data = (0 until 60).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.7))
    }
    // ids 3, 10, 41: sorted rank != positional order of insertion
    val cent = Seq(41L -> centers(2), 3L -> centers(0), 10L -> centers(1))
    compare(data, cent)
  }

  test("exact distance ties break to the smaller centroid id in both") {
    // two centroids equidistant from every point on the perpendicular
    // bisector plane; duplicate centroid positions tie everywhere
    val data = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 5.0)), (2L, Seq(1.0, -2.0)),
      (3L, Seq(0.0, 0.0)), (4L, Seq(2.0, 0.0)))
    val cent = Seq(7L -> Seq(0.0, 0.0), 2L -> Seq(2.0, 0.0),
      9L -> Seq(2.0, 0.0)) // 2 and 9 duplicate -> ties resolve to 2
    compare(data, cent)
  }

  test("fit still equals the relational-assign fixpoint (2 iters)") {
    val rnd = new scala.util.Random(3)
    val centers = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(0.0, 10.0))
    val data = (0 until 45).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.5))
    }
    val vecs = data.toDF("vec_id", "v")
    val got = KMeans.fit(vecs, "vec_id", k = 3, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    // reference: the pre-optimization shape — relational assign +
    // DataFrame-side keep-previous union, collect-routed per iteration
    def localAssign(cent: Seq[(Long, Seq[Double])]) =
      KMeans.assign(vecs, cent.toDF("cid", "cv"), "vec_id")
    var cent = data.sortBy(_._1).take(3)
    val a1 = localAssign(cent)
    val upd = KMeans.recentroid(a1).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    cent = cent.map { case (cid, cv) => cid -> upd.getOrElse(cid, cv).toSeq }
    val want = localAssign(cent)
      .select(col("vec_id"), col("cid"), col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(got.sameElements(want))
  }
}
