package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Deterministic PCA: the fixed-point power iteration recovers a planted
  * dominant direction, agrees with a plain-double reference iteration to
  * fixed-point precision, is partitioning-invariant bit-for-bit, and the
  * projection ranks the planted extremes first. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 8
  // planted unit direction (3, 1, 0, ...) / sqrt(10)
  private val u: Array[Double] = {
    val raw = Array(3.0, 1.0) ++ Array.fill(Dim - 2)(0.0)
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }
  // orthogonal to u: (-1, 3, 0, ...) / sqrt(10)
  private val w: Array[Double] = {
    val raw = Array(-1.0, 3.0) ++ Array.fill(Dim - 2)(0.0)
    val n = math.sqrt(raw.map(x => x * x).sum)
    raw.map(_ / n)
  }

  /** 200 deterministic points: dominant spread along u (amplitude ~10),
    * small spread along w (~0.5), a sprinkle on every axis (~0.05) so no
    * dimension has exactly zero variance. */
  private def corpus = (0 until 200).map { t =>
    val a = math.sin(t + 1.0) * 10.0
    val b = math.sin(3.0 * t + 1.0) * 0.5
    val v = Array.tabulate(Dim)(d =>
      (a * u(d) + b * w(d) + 0.05 * math.sin(7.0 * t + d)).toFloat)
    (t.toLong, v)
  }.toDF("vec_id", "embedding")

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) *
      math.sqrt(b.map(x => x * x).sum))
  }

  test("the fitted direction recovers the planted dominant axis") {
    val (_, dir) = Pca.fit(corpus, "embedding")
    val v = dir.map(_.toDouble / 1e6)
    assert(math.abs(cosine(v, u)) > 0.999)
    // and is clearly NOT the secondary axis
    assert(math.abs(cosine(v, w)) < 0.1)
  }

  test("fixed-point iteration matches a plain-double power iteration " +
    "to fixed-point precision") {
    val mean = Pca.meanVector(corpus, "embedding")
    val covRows = Pca.covarianceUpper(corpus, "embedding", mean).collect()
    val cov = covRows.map(r => (r.getInt(0), r.getInt(1)) ->
      BigInt(r.getDecimal(2).toBigIntegerExact)).toMap
    val fixed = Pca.topDirectionFixedPoint(cov, Dim, iters = 8)
      .map(_.toDouble / 1e6)
    // reference: the same matrix in doubles, iterated far past
    // convergence with max-|component| normalization
    def at(i: Int, j: Int): Double =
      (if (i <= j) cov((i, j)) else cov((j, i))).toDouble / 1e9
    var v = Array.tabulate(Dim)(d =>
      if (d == (0 until Dim).maxBy(k => at(k, k))) 1.0 else 0.0)
    for (_ <- 1 to 100) {
      val wv = Array.tabulate(Dim)(i =>
        (0 until Dim).map(j => at(i, j) * v(j)).sum)
      val m = wv.map(math.abs).max
      v = wv.map(_ / m)
    }
    assert(math.abs(cosine(fixed, v)) > 1.0 - 1e-6)
  }

  test("renormalization pins max |component| to exactly 1e6") {
    val (_, dir) = Pca.fit(corpus, "embedding")
    assert(dir.map(math.abs).max == 1000000L)
  }

  test("fit is partitioning-invariant bit-for-bit") {
    val (m1, d1) = Pca.fit(corpus.coalesce(1), "embedding")
    val (m7, d7) = Pca.fit(corpus.repartition(7), "embedding")
    assert(m1.toSeq == m7.toSeq)
    assert(d1.toSeq == d7.toSeq)
  }

  test("guards: empty input, zero variance") {
    intercept[IllegalArgumentException] {
      Pca.fit(corpus.where(lit(false)), "embedding")
    }
    val constant = (0 until 10)
      .map(t => (t.toLong, Array.fill(Dim)(1.5f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pca.fit(constant, "embedding")
    }
    assert(e.getMessage.contains("RESOLVABLE at 1e-9"))
  }

  test("guard: a component outside the fixed-point domain raises " +
    "loudly instead of saturating the 64-bit floor") {
    // |x| > 3e4: floor(x*1e9) would exceed Long range in products —
    // Spark would clamp silently where the HUGEINT oracle would not
    val big = (0 until 10)
      .map(t => (t.toLong,
        Array.fill(Dim)(if (t == 3) 4.0e4f else 1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] { Pca.meanVector(big, "embedding") }
    assert(e.getMessage.contains("fixed-point domain"))
  }

  test("dimStats matches a scalar reference (mean + sample sigma)") {
    val rows = corpus.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getSeq[Float](1).toArray.map(_.toDouble))
    val mean = Pca.meanVector(corpus, "embedding")
    val got = Pca.dimStats(corpus, "embedding", mean)
      .orderBy("i").collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))
    (0 until Dim).foreach { d =>
      val xs = rows.map(_(d))
      val mu = xs.sum / xs.length
      val ss = xs.map(x => { val c = x - mean(d); c * c }).sum
      val sigma = math.sqrt(ss / (xs.length - 1))
      assert(math.abs(got(d)._1 - mu) < 1e-7, s"mu dim $d")
      // fixed-point flooring perturbs sigma by < 1e-9 per term
      assert(math.abs(got(d)._2 - sigma) < 1e-7, s"sigma dim $d")
    }
  }

  test("dimStats is partitioning-invariant bit-for-bit") {
    val mean = Pca.meanVector(corpus, "embedding")
    val a = Pca.dimStats(corpus, "embedding", mean)
      .orderBy("i").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val b = Pca.dimStats(corpus.repartition(7), "embedding", mean)
      .orderBy("i").collect().map(r => (r.getDouble(1), r.getDouble(2)))
    assert(a.toSeq == b.toSeq)
  }

  test("standardize z-scores to mean ~0 / sigma ~1 and zeroes constant " +
    "dimensions") {
    // dimension Dim-1 replaced by a constant: sigma = 0 there
    val fixed = corpus.select(col("vec_id"),
      concat(slice(col("embedding"), 1, Dim - 1),
        array(lit(2.5f))).as("embedding"))
    val mean = Pca.meanVector(fixed, "embedding")
    val st = Pca.dimStats(fixed, "embedding", mean)
      .orderBy("i").collect().map(_.getDouble(2))
    val z = fixed.select(posexplode(
        Pca.standardize(col("embedding"), mean, st)).as(Seq("i", "z")))
      .groupBy(col("i"))
      .agg(avg(col("z")).as("zm"),
        stddev_samp(col("z")).as("zs"),
        countDistinct(col("z")).as("nd"))
      .orderBy("i").collect()
    (0 until Dim - 1).foreach { d =>
      assert(math.abs(z(d).getDouble(1)) < 1e-5, s"z-mean dim $d")
      assert(math.abs(z(d).getDouble(2) - 1.0) < 1e-4, s"z-sigma dim $d")
    }
    // the constant dimension: every z is exactly 0, not NaN
    assert(z(Dim - 1).getLong(3) == 1L)
    val zLast = fixed.select(element_at(
        Pca.standardize(col("embedding"), mean, st), Dim).as("z"))
      .distinct().collect().map(_.getDouble(0)).toSeq
    assert(zLast == Seq(0.0))
  }

  test("projection ranks the planted extremes first and centers near 0") {
    val (mean, dir) = Pca.fit(corpus, "embedding")
    val scored = corpus.select(col("vec_id"),
        Pca.projection(col("embedding"), mean, dir).as("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the signed score must be (anti-)linear in the planted amplitude:
    // score ~ +-(a_t - mean(a)); Pearson |r| > 0.999 (sign free — an
    // eigenvector's sign is arbitrary)
    val amp = (0 until 200).map(t => math.sin(t + 1.0) * 10.0)
    val sc = (0 until 200).map(t => scored(t.toLong))
    def centered(xs: Seq[Double]) = { val m = xs.sum / xs.size; xs.map(_ - m) }
    val (ca, cs) = (centered(amp), centered(sc))
    val r = ca.zip(cs).map { case (a, b) => a * b }.sum /
      math.sqrt(ca.map(x => x * x).sum * cs.map(x => x * x).sum)
    assert(math.abs(r) > 0.999)
    // the least-displaced point projects near zero
    val minAmpId = amp.zipWithIndex.minBy { case (a, _) => math.abs(a) }._2
    assert(math.abs(scored(minAmpId.toLong)) < 1.0)
  }
}
