package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic k-means: separable blobs recover their generator
  * clusters, the fit is partitioning-invariant, and the assignment
  * matches a scalar reference implementation. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  /** 3 well-separated blobs around (0,0), (10,0), (0,10); ids interleave
    * blobs so smallest-id init picks from different blobs. */
  private def blobs(nPer: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(5)
    val centers = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(0.0, 10.0))
    (0 until nPer * 3).map { i =>
      val c = centers(i % 3)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.5))
    }
  }

  private def fitMap(data: Seq[(Long, Seq[Double])], k: Int, iters: Int,
                     parts: Int = 4): Map[Long, Long] =
    KMeans.fit(
        data.toDF("vec_id", "v").repartition(parts), "vec_id", k, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("separable blobs: clusters coincide with generator blobs") {
    val data = blobs(40)
    val got = fitMap(data, k = 3, iters = 3)
    // every generator blob must map to exactly one fitted cluster
    val byBlob = data.groupBy(_._1 % 3).map { case (b, rows) =>
      b -> rows.map(r => got(r._1)).distinct
    }
    byBlob.foreach { case (b, cids) =>
      assert(cids.size == 1, s"blob $b split across clusters $cids")
    }
    assert(byBlob.values.flatten.toSet.size == 3)
  }

  test("fit is invariant under input partitioning") {
    val data = blobs(25)
    assert(fitMap(data, 3, 2, parts = 1) == fitMap(data, 3, 2, parts = 11))
  }

  test("assignment matches a scalar reference (same init, same ties)") {
    val data = blobs(15)
    val got = fitMap(data, k = 3, iters = 2)
    // scalar mirror: exact double arithmetic differs from the decimal
    // route only below the 1e-9 term rounding; blob distances are O(1)
    // apart so argmin agrees
    var cents = data.sortBy(_._1).take(3).map(_._2)
    var assignment = Map.empty[Long, Int]
    (1 to 2).foreach { it =>
      assignment = data.map { case (id, v) =>
        val ds = cents.zipWithIndex.map { case (c, ci) =>
          (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, ci)
        }
        id -> ds.min._2
      }.toMap
      if (it < 2)
        cents = (0 until 3).map { ci =>
          val members = data.filter(r => assignment(r._1) == ci).map(_._2)
          (0 until 2).map(d => members.map(_(d)).sum / members.size)
        }
    }
    // reference cluster index == position of the init id among cids
    val refToCid = data.sortBy(_._1).take(3).map(_._1).zipWithIndex
      .map { case (id, ci) => ci -> got(id) }.toMap
    data.foreach { case (id, _) =>
      assert(got(id) == refToCid(assignment(id)),
        s"vec $id: engine ${got(id)} vs reference ${assignment(id)}")
    }
  }

  test("fixed iteration count: more iterations only move centroids, " +
      "assignment stays deterministic per run") {
    val data = blobs(20)
    val a = fitMap(data, 3, 2)
    val b = fitMap(data, 3, 2)
    assert(a == b)
  }

  test("duplicate init vectors: an emptied cluster keeps its centroid " +
      "instead of silently vanishing") {
    // ids 0 and 1 identical -> every point tie-breaks to cid 0, cluster 1
    // empties in iteration 1; the k-cluster contract must survive
    val data = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(0.0, 0.0)), (2L, Seq(10.0, 10.0)),
      (3L, Seq(0.1, 0.0)), (4L, Seq(10.1, 10.0)), (5L, Seq(0.0, 0.2)))
    val got = fitMap(data, k = 3, iters = 2)
    // iteration 1 empties cluster 1 (ties to cid 0); with its centroid
    // RETAINED at (0,0), iteration 2's moved cid-0 centroid (0.025,0.05)
    // loses the exact-origin points back to cid 1 — the re-acquisition
    // the retention exists for. Far blob stays cid 2 throughout.
    assert(got(0L) == 1L && got(1L) == 1L, s"origin points: $got")
    assert(got(3L) == 0L && got(5L) == 0L, s"near points: $got")
    assert(got(2L) == 2L && got(4L) == 2L, s"far points: $got")
    assert(got.size == 6)
  }
}
