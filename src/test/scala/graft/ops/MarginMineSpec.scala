package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Margin-based kNN bitext mining: hand-computed margins, the
  * hub-demotion property the margin exists for (a hub target with the
  * HIGHEST raw cosine to a source loses to the source's specific
  * partner once neighborhood means divide it away), and the degenerate
  * all-orthogonal case. */
class MarginMineSpec extends SparkSpec {
  import spark.implicits._

  test("hub demotion: raw cosine picks the hub, margin picks the " +
      "specific partner; margins match hand arithmetic") {
    // sources: unit axes. targets: a hub near BOTH sources (cos 0.824 /
    // 0.566), plus one specific partner per source (cos 0.8, orthogonal
    // to the other source).
    val src = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0))).toDF("vec_id", "v")
    val tgt = Seq(
      (1L, Seq(0.8, 0.55, 0.0, 0.0)), // the hub
      (3L, Seq(0.8, 0.0, 0.6, 0.0)), // partner of src 0
      (5L, Seq(0.0, 0.8, 0.0, 0.6))) // partner of src 2
      .toDF("vec_id", "v")

    // raw top-1 for src 0 IS the hub (0.824178 > 0.8)
    val raw = VectorOps.topKCosine(src.where(col("vec_id") === 0),
        tgt, "vec_id", "v", 1)
      .collect()
    assert(raw.head.getLong(2) == 1L, s"raw cosine should pick the hub")

    val mined = VectorOps.marginMine(src, tgt, "vec_id", "v", k = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // hand arithmetic (6-dp-rounded cosines, exact decimal k-means;
    // |hub| = sqrt(0.8^2 + 0.55^2) = sqrt(0.9425)):
    //   cos(0,hub)=round(0.8/0.970824,6)=0.824042, cos(0,t3)=0.8
    //   fwd(0)=(0.824042+0.8)/2=0.812021,
    //   bwd(hub)=(0.824042+0.566529)/2=0.695286 (cos(2,hub)=0.566529),
    //   bwd(t3)=(0.8+0)/2=0.4
    //   margin(0,hub)=0.824042/((0.812021+0.695286)/2)=1.093397
    //   margin(0,t3)=0.8/((0.812021+0.4)/2)=1.320109 -> t3 wins
    val (t0, c0, m0) = mined(0L)
    assert(t0 == 3L, s"margin must demote the hub, got target $t0")
    assert(c0 == 0.8, s"cos $c0")
    assert(math.abs(m0 - 1.320109) < 1e-6, s"margin $m0")
    val (t2, _, m2) = mined(2L)
    assert(t2 == 5L && m2 > 1.0, s"src 2 -> $t2 margin $m2")
  }

  test("all-orthogonal neighborhoods score margin 0, never NaN") {
    val src = Seq((0L, Seq(1.0, 0.0))).toDF("vec_id", "v")
    val tgt = Seq((1L, Seq(0.0, 1.0)), (3L, Seq(0.0, -1.0)))
      .toDF("vec_id", "v")
    val rows = VectorOps.marginMine(src, tgt, "vec_id", "v", k = 2)
      .collect()
    assert(rows.length == 1)
    assert(rows.head.getDouble(4) == 0.0) // margin
    assert(rows.head.getLong(2) == 1L) // tie on margin -> smaller tgt id
  }

  // --- the candidate-fed scale form -----------------------------------

  private def corpus(n: Int, d: Int, parity: Int) = {
    // deterministic spread: vec i = normalized mix of two axes — enough
    // geometry for distinct cosines, no randomness
    (0 until n).filter(_ % 2 == parity).map { i =>
      val v = Array.tabulate(d)(j =>
        math.sin(i * d + j + 1.0) + (if (j == i % d) 2.0 else 0.0))
      (i.toLong, v.toSeq)
    }
  }

  test("overPairs on the full candidate cross is bit-identical to " +
      "marginMine (delegation identity)") {
    val src = corpus(20, 6, 0).toDF("vec_id", "v")
    val tgt = corpus(20, 6, 1).toDF("vec_id", "v")
    val pairs = src.select(col("vec_id").as("src_id"))
      .crossJoin(tgt.select(col("vec_id").as("tgt_id")))
    val a = VectorOps.marginMine(src, tgt, "vec_id", "v", k = 3, topM = 2)
      .collect().map(_.toSeq).toSet
    val b = VectorOps.marginMineOverPairs(pairs, src, tgt, "vec_id", "v",
      k = 3, topM = 2).collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("a candidate set containing every true k-neighborhood reproduces " +
      "the all-pairs margins bit-for-bit (LSH-fed equivalence)") {
    val src = corpus(24, 8, 0).toDF("vec_id", "v")
    val tgt = corpus(24, 8, 1).toDF("vec_id", "v")
    val k = 2
    // build candidates = each src's true top-k targets UNION each tgt's
    // true top-k sources (ranked by exact cosine on the driver — 24
    // vectors) — by construction every vector's k-neighborhood is in
    // the pair set, the containment premise under which
    // overPairs == all-pairs
    val all = src.select(col("vec_id").as("src_id"), col("v").as("sv"))
      .crossJoin(tgt.select(col("vec_id").as("tgt_id"), col("v").as("tv")))
      .select(col("src_id"), col("tgt_id"),
        round(VectorOps.cosine(col("sv"), col("tv")), 6).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val bySrc = all.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(k).toSeq }
    val byTgt = all.groupBy(_._2).toSeq.flatMap { case (_, rs) =>
      rs.sortBy(r => (-r._3, r._1)).take(k).toSeq }
    val cand = (bySrc ++ byTgt).map(r => (r._1, r._2)).distinct
      .toDF("src_id", "tgt_id")
    val full = VectorOps.marginMine(src, tgt, "vec_id", "v", k)
      .collect().map(_.toSeq).toSet
    val fed = VectorOps.marginMineOverPairs(cand, src, tgt, "vec_id", "v", k)
      .collect().map(_.toSeq).toSet
    assert(fed == full && full.nonEmpty,
      s"candidate-fed diverged: ${fed.size} vs ${full.size}")
  }

  test("fewer than k candidates: neighborhood mean divides by the " +
      "ACTUAL count, not k (Artetxe & Schwenk mean)") {
    val src = Seq((0L, Seq(1.0, 0.0, 0.0))).toDF("vec_id", "v")
    val tgt = Seq((1L, Seq(0.8, 0.6, 0.0))).toDF("vec_id", "v")
    val pairs = Seq((0L, 1L)).toDF("src_id", "tgt_id")
    val r = VectorOps.marginMineOverPairs(pairs, src, tgt, "vec_id", "v",
      k = 4).collect().head
    // cos = 0.8; fwd = bwd = 0.8/1 (ONE candidate, k=4) -> margin 1.0.
    // a constant-k divisor would give fwd=bwd=0.2 -> margin 4.0.
    assert(r.getDouble(3) == 0.8 && r.getDouble(4) == 1.0,
      s"cos ${r.getDouble(3)} margin ${r.getDouble(4)}")
  }

  test("IVF-probed candidates feed the same scorer (the second " +
      "generator next to LSH): within-cluster containment reproduces " +
      "all-pairs bit-for-bit") {
    // three tight clusters on orthogonal axes: every vector's true
    // k-neighborhood on the other side is within its own cluster, so
    // single-probe IVF candidates satisfy the containment premise
    def cluster(axis: Int, ids: Seq[Long], mag: Double) = ids.map { i =>
      (i, Seq.tabulate(6)(j =>
        (if (j == axis) mag else 0.0) + 0.01 * ((i + j) % 5)))
    }
    val tgt = (cluster(0, Seq(1L, 3L, 5L, 7L), 8.0) ++
      cluster(1, Seq(9L, 11L, 13L, 15L), 8.0) ++
      cluster(2, Seq(17L, 19L, 21L, 23L), 8.0)).toDF("vec_id", "v")
    val src = (cluster(0, Seq(0L, 2L, 4L), 9.0) ++
      cluster(1, Seq(6L, 8L, 10L), 9.0) ++
      cluster(2, Seq(12L, 14L, 16L), 9.0)).toDF("vec_id", "v")
    // index metadata as a deployment stages it: one centroid per cell
    // + the target-side cell assignment (here known by construction;
    // production derives both from KMeans.fit / PqStage.cellCentroids)
    val centroids = Seq(
      (0L, Seq(8.0, 0.0, 0.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.0, 8.0, 0.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 0.0, 8.0, 0.0, 0.0, 0.0))).toDF("cell", "cv")
    val tgtCells = tgt.select(col("vec_id").as("tgt_id"),
      (floor(col("vec_id") / 8)).cast("long").as("cell"))
    val probed = Pq.probeCells(src, "vec_id", "v", centroids, "cell",
      probes = 1)
    val pairs = probed.select(col("id").as("src_id"), col("cell"))
      .join(tgtCells, "cell").select(col("src_id"), col("tgt_id"))
    // candidate set = own-cluster targets only: 9 src x 4 = 36 pairs,
    // not 9 x 12 = 108
    assert(pairs.count() == 36)
    val fed = VectorOps.marginMineOverPairs(pairs, src, tgt, "vec_id",
      "v", k = 2).collect().map(_.toSeq).toSet
    val full = VectorOps.marginMine(src, tgt, "vec_id", "v", k = 2)
      .collect().map(_.toSeq).toSet
    assert(fed == full && full.size == 9,
      s"IVF-fed diverged: ${fed.size} vs ${full.size}")
  }

  test("a pair referencing an absent vector fails loudly, naming it") {
    val src = Seq((0L, Seq(1.0, 0.0))).toDF("vec_id", "v")
    val tgt = Seq((1L, Seq(0.0, 1.0))).toDF("vec_id", "v")
    val pairs = Seq((0L, 99L)).toDF("src_id", "tgt_id")
    val e = intercept[Exception] {
      VectorOps.marginMineOverPairs(pairs, src, tgt, "vec_id", "v", k = 1)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("absent") && m.contains("99")),
      s"wanted the loud absent-vector error, got: ${msgs(e)}")
  }
}
