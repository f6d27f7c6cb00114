package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** JL random projection + shortlist/re-rank ANN: the projection is
  * bit-exact against a driver-side replay of the sin-direction family,
  * re-ranked scores are the TRUE cosines, recall against exact search
  * is measured (not asserted) on clustered vectors, and the
  * shortlist/k contract is enforced. */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  test("projection matches the sin-direction family bit-for-bit") {
    val v = (0 until 6).map(i => i + 0.5)
    val got = Seq(Tuple1(v)).toDF("v")
      .select(VectorOps.randomProject(col("v"), 6, 3).as("rv"))
      .as[Seq[Double]].head()
    val want = (0 until 3).map { r =>
      var acc = 0.0
      for (i <- 0 until 6) acc += v(i) * math.sin(r * 6 + i + 1.0)
      acc
    }
    assert(got == want)
  }

  private lazy val clustered = {
    val rnd = new scala.util.Random(20260814)
    val dim = 32
    val centers = Array.fill(5)(Array.fill(dim)(rnd.nextDouble() - 0.5))
    (0 until 100).map { i =>
      val c = centers(i % 5)
      (i.toLong, c.toSeq.map(_ + (rnd.nextDouble() - 0.5) * 0.05))
    }.toDF("id", "v")
  }

  test("re-ranked scores are the exact cosines; recall@5 over 20-shortlist") {
    val q = clustered.where(col("id") < 5)
    val rp = VectorOps.topKCosineRp(q, clustered, "id", "v",
        dim = 32, rDim = 8, shortlist = 20, k = 5)
      .select("query_id", "rank", "cand_id", "sim")
      .as[(Long, Int, Long, Double)].collect().toSeq
    val exact = VectorOps.topKCosine(q, clustered, "id", "v", 5)
      .select("query_id", "rank", "cand_id", "sim")
      .as[(Long, Int, Long, Double)].collect().toSeq
    // every RP-returned sim is the true rounded cosine (the re-rank is
    // exact; only the candidate SET can differ from exhaustive search)
    val exactAll = VectorOps.topKCosine(q, clustered, "id", "v", 99)
      .select("query_id", "cand_id", "sim")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    rp.foreach { case (qid, _, cid, s) =>
      assert(exactAll((qid, cid)) == s,
        s"re-ranked sim for ($qid,$cid) is not the true cosine") }
    // measured recall: fraction of exact top-5 recovered
    val want = exact.map(r => (r._1, r._3)).toSet
    val got = rp.map(r => (r._1, r._3)).toSet
    val recall = (want & got).size.toDouble / want.size
    // tight clusters + 8 JL dims: measured 1.0 on this fixture; the
    // floor leaves room for platform libm drift without letting a
    // broken projection pass
    assert(recall >= 0.8, s"recall@5 collapsed: $recall")
    assert(rp.groupBy(_._1).forall(_._2.map(_._2).sorted == Seq(1, 2, 3, 4, 5)))
  }

  test("shortlist smaller than k is rejected") {
    intercept[IllegalArgumentException] {
      VectorOps.topKCosineRp(clustered, clustered, "id", "v", 32, 8,
        shortlist = 3, k = 5)
    }
  }
}
