package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** SemDeDup-style semantic dedup: brute-force equivalence of the
  * one-pass drop rule, the rank-1-always-kept and planted-duplicate
  * collapse properties, the already-dropped-still-dominates semantics
  * that distinguish the paper's upper-triangular test from a
  * kept-only-dominates variant, and partitioning invariance. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i)
      nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Independent reimplementation of the drop rule over a collected
    * (id, v, cid, d) assignment: rank farthest-from-centroid first
    * (round(d,6) desc, id), drop iff some EARLIER-ranked cluster member
    * (kept or not) has round(cosine,6) >= tau, dup_of = the earliest
    * such member. */
  private def reference(rows: Seq[(Long, Array[Double], Long, Double)],
                        tau: Double): Map[Long, Long] =
    rows.groupBy(_._3).values.flatMap { cluster =>
      val ordered = cluster.sortBy { case (id, _, _, d) => (-round6(d), id) }
      ordered.zipWithIndex.map { case ((id, v, _, _), i) =>
        val dom = ordered.take(i).find { case (_, u, _, _) =>
          round6(cosine(u, v)) >= tau }
        id -> dom.map(_._1).getOrElse(-1L)
      }
    }.toMap

  private def run(vectors: DataFrame, fit: DataFrame, tau: Double) =
    Dedup.semanticDedup(vectors, fit, "id", tau)
      .select("id", "cid", "kept", "dup_of")
      .as[(Long, Long, Boolean, Long)].collect().toSeq.sortBy(_._1)

  private def randomCorpus(seed: Int, n: Int, dim: Int,
                           planted: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val base = (0 until n).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian()))
    }
    // planted near-dups: copies of early vectors with tiny noise, ids
    // after the originals so the copy ranks later on id ties
    val dupes = (0 until planted).map { j =>
      val (srcId, v) = base(j % base.size)
      ((n + j).toLong, v.map(_ + rnd.nextGaussian() * 1e-4))
    }
    (base ++ dupes).toDF("id", "v")
  }

  test("equals the brute-force reference on a clustered corpus") {
    val df = randomCorpus(20260815, 150, 6, planted = 25)
      .repartition(11, col("id"))
    val fit = KMeans.fit(df, "id", k = 3, iters = 2)
    val assignment = df.join(fit, "id")
      .select("id", "v", "cid", "d")
      .as[(Long, Array[Double], Long, Double)].collect().toSeq
    val want = reference(assignment, tau = 0.8)
    val got = run(df, fit, tau = 0.8)
    assert(got.size == 175)
    got.foreach { case (id, _, kept, dupOf) =>
      assert(dupOf == want(id), s"id=$id dup_of")
      assert(kept == (want(id) == -1L), s"id=$id kept")
    }
    // the planted copies must actually exercise the drop path
    assert(got.count(!_._3) >= 20, "planted dupes should be dropped")
  }

  test("rank 1 of every cluster is always kept") {
    val df = randomCorpus(7, 100, 5, planted = 40)
    val fit = KMeans.fit(df, "id", k = 4, iters = 2)
    val got = run(df, fit, tau = 0.5)
    val keptPerCluster = got.groupBy(_._2).view.mapValues(_.count(_._3))
    assert(keptPerCluster.values.forall(_ >= 1),
      "every cluster keeps at least its rank-1 member")
  }

  test("exact planted duplicates collapse to one kept per set") {
    // 5 copies of one vector + unrelated fillers far away
    val rnd = new scala.util.Random(3)
    val proto = Array.fill(6)(rnd.nextGaussian())
    val copies = (0L until 5L).map(i => (i, proto.clone()))
    val fillers = (10L until 30L).map(i =>
      (i, Array.fill(6)(rnd.nextGaussian() * 3)))
    val df = (copies ++ fillers).toDF("id", "v")
    val fit = KMeans.fit(df, "id", k = 2, iters = 2)
    val got = run(df, fit, tau = 0.999)
    val copyRows = got.filter(_._1 < 5)
    assert(copyRows.count(_._3) == 1, "exactly one copy survives")
    assert(copyRows.filter(!_._3).forall(_._4 < 5),
      "dropped copies point at another copy")
  }

  test("tau above every pairwise cosine keeps the whole corpus") {
    val df = randomCorpus(11, 60, 16, planted = 0)
    val fit = KMeans.fit(df, "id", k = 2, iters = 2)
    val got = run(df, fit, tau = 0.999)
    assert(got.forall(_._3) && got.forall(_._4 == -1L))
  }

  test("an already-dropped vector still dominates later ranks") {
    // three unit vectors at angles 0, t, 2t with cos(t)=0.95 >= tau=0.9
    // and cos(2t)=0.805 < tau. k=1, iters=1: the centroid is vector A
    // (smallest id), so the farthest-first rank is C, B, A. C is kept;
    // B is dropped by C; A's ONLY dominator at tau=0.9 is B (cos(A,C)
    // misses) — a kept-only-dominates variant would keep A, the paper's
    // upper-triangular test drops it with dup_of = B.
    val t = math.acos(0.95)
    def at(ang: Double) = Array(math.cos(ang), math.sin(ang))
    val df = Seq((1L, at(0)), (2L, at(t)), (3L, at(2 * t))).toDF("id", "v")
    val fit = KMeans.fit(df, "id", k = 1, iters = 1)
    val got = run(df, fit, tau = 0.9)
    assert(got == Seq((1L, 1L, false, 2L), (2L, 1L, false, 3L),
      (3L, 1L, true, -1L)))
  }

  test("partitioning invariance") {
    val base = randomCorpus(42, 120, 6, planted = 30)
    def once(parts: Int, key: String): Seq[(Long, Long, Boolean, Long)] = {
      val df = base.repartition(parts, col(key))
      run(df, KMeans.fit(df, "id", k = 3, iters = 2), tau = 0.8)
    }
    assert(once(3, "id") == once(17, "v"))
  }

  test("tau outside (0, 1] is rejected") {
    val df = randomCorpus(1, 10, 4, planted = 0)
    val fit = KMeans.fit(df, "id", k = 2, iters = 1)
    intercept[IllegalArgumentException] {
      Dedup.semanticDedup(df, fit, "id", tau = 0.0) }
    intercept[IllegalArgumentException] {
      Dedup.semanticDedup(df, fit, "id", tau = 1.5) }
  }
}
