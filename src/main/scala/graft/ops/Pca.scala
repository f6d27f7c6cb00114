package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic top-principal-component extraction over an embedding
  * column — the whitening/rotation primitive a large-corpus embedding
  * pipeline runs before clustering or product quantization (OPQ-style
  * rotations, IVF cell shaping; Jégou et al. 2011 §III discusses the
  * PCA-then-quantize pipeline). Everything is built from the repo's
  * cross-engine-exact conventions so the whole computation — including
  * the ITERATIVE eigenvector solve — replays bit-exactly in DuckDB:
  *
  *  - the mean and the covariance both live in 1e-9 floor fixed
  *    point: every element and every centered product is floored into
  *    an exact integer BEFORE its sum — floor is bit-deterministic on
  *    IEEE doubles where a decimal cast's half-boundary rounding
  *    measurably is not (both hazards were observed at sf0.1), and
  *    integer sums are order-independent, so partition layout cannot
  *    perturb a bit;
  *  - the power iteration runs in EXACT INTEGER arithmetic (the
  *    `pq_train` unrolled-replay pattern): covariance scaled to
  *    integers at 1e9, the vector at 1e6, matvecs as exact integer
  *    sums, renormalization by the max-|component| via truncating
  *    division on non-negative operands (sign split off first, so
  *    floor == trunc ambiguity never arises). No sqrt, no libm, no
  *    float accumulation anywhere in the loop.
  *
  * Scale shape: the corpus is touched exactly TWICE (mean pass,
  * covariance pass), each a posexplode whose partial aggregation
  * reduces every task to <= D resp. D(D+1)/2 groups before the
  * exchange — the shuffle moves (tasks x 2080) rows for D = 64, never
  * data-sized. The D^2 covariance is a bounded table (the collect-route
  * idiom, like the PQ codebook) and the iteration is driver arithmetic
  * on 64 integers. The quadratic-in-D explode cost is CPU-bounded per
  * row (one outer product — the price any covariance accumulation
  * pays), pipelined straight into the hash aggregate. */
object Pca {

  /** The fixed-point domain bound: |component| <= 3e4 keeps every
    * per-element floor (<= 3e13) and every centered-product floor
    * (< 3.6e18, with |centered| <= 2 * 3e4) inside a signed 64-bit
    * long — Spark's floor(double) RETURNS a long and would saturate
    * silently at Long.MaxValue where the DuckDB oracle's HUGEINT keeps
    * the true value. Checked in-column with raise_error (the packSpans
    * idiom — column pruning cannot drop it), so out-of-domain
    * embeddings fail loudly instead of gating FAIL(hash). */
  private val MaxAbsComponent = 3.0e4

  private def guarded(x: Column): Column =
    when(abs(x) <= lit(MaxAbsComponent), x)
      .otherwise(raise_error(concat(
        lit("Pca: |component| > 3e4 is outside the 1e-9 fixed-point " +
          "domain (64-bit floor would saturate); rescale the vectors, " +
          "got "), x.cast("string"))).cast("double"))

  /** Per-dimension mean of `vecCol` (array<float>/array<double>) in the
    * same floor fixed-point as the covariance: exact integer sums of
    * floor(x * 1e9), then two deterministic double divisions (by 1e9,
    * then the exact count). A decimal(18,9) cast here — the centroid
    * recipe — hits the same cross-engine half-boundary hazard the
    * covariance products do (observed on one dimension at sf0.1); floor
    * is bit-deterministic. One bounded aggregation (D rows collected —
    * dimensionality is a model constant, never data-sized). */
  def meanVector(df: DataFrame, vecCol: String): Array[Double] = {
    val rows = df
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg((sum(floor(guarded(col("x")) * lit(1e9)).cast("decimal(38,0)"))
        .cast("double") / lit(1e9) / count(lit(1))).as("mu"))
      .collect()
    require(rows.nonEmpty, "meanVector: input is empty")
    val out = new Array[Double](rows.length)
    rows.foreach(r => out(r.getInt(0)) = r.getDouble(1))
    out
  }

  /** Upper-triangle covariance entries (i <= j) as exact integers at
    * 1e-9 fixed point: cov_fp(i, j) = SUM over rows of
    * floor(product * 1e9), the double product of centered components
    * floored into an integer BEFORE the sum. floor — unlike a decimal
    * cast's HALF_UP rounding, which the two engines disagree on for
    * products landing within a double ulp of a 9-dp half boundary
    * (measured: 5 of 2080 sums at sf0.1) — is bit-deterministic on any
    * IEEE double, so the sum is order-independent AND engine-exact.
    * Uncorrected second moment about the provided mean (the power
    * iteration only needs the direction; a 1/n or 1/(n-1) scalar — or
    * the 1e9 scale — cannot change an eigenvector).
    *
    * Plan: one posexplode pair (outer product, j >= i) pipelined into a
    * partial hash aggregate of <= D(D+1)/2 groups per task, ONE
    * exchange of those bounded partials. */
  def covarianceUpper(df: DataFrame, vecCol: String,
                      mean: Array[Double]): DataFrame = {
    val centered = zip_with(col(vecCol).cast("array<double>"),
      lit(mean), (x, m) => guarded(x) - m)
    df.select(centered.as("cv"))
      .select(posexplode(col("cv")).as(Seq("i", "xi")), col("cv"))
      .select(col("i"), col("xi"),
        posexplode(col("cv")).as(Seq("j", "xj")))
      .where(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(sum(floor(col("xi") * col("xj") * lit(1e9))
        .cast("decimal(38,0)")).as("cov_fp"))
  }

  /** Deterministic power iteration in exact integer arithmetic over the
    * collected upper-triangle covariance. `covFp` carries the decimal
    * entries scaled to integers at 1e9; the returned direction is
    * fixed-point at 1e6 with max-|component| exactly 1e6 (the
    * renormalization divisor). Start vector: the basis vector of the
    * largest diagonal entry (smallest index on ties) — deterministic,
    * and never annihilated by a PSD matrix unless the dimension is
    * constant (guarded loudly). Convergence is geometric in
    * |lambda2/lambda1|; `iters` defaults to 8, plenty for the
    * well-separated spectra embeddings have in practice — and whatever
    * the caller picks, the oracle replays the SAME count, so
    * correctness never depends on convergence. */
  def topDirectionFixedPoint(covFp: Map[(Int, Int), BigInt], dim: Int,
                             iters: Int = 8): Array[Long] = {
    require(dim >= 1 && iters >= 1, s"dim=$dim iters=$iters")
    val scaleV = BigInt(1000000)
    def at(i: Int, j: Int): BigInt =
      if (i <= j) covFp.getOrElse((i, j), BigInt(0))
      else covFp.getOrElse((j, i), BigInt(0))
    val startDim = (0 until dim).maxBy(d => (at(d, d), -d))
    require(at(startDim, startDim) > 0,
      "topDirectionFixedPoint: every diagonal fixed-point entry is " +
        "zero — the input has no variance RESOLVABLE at 1e-9 (per-row " +
        "squared deviations below ~3.2e-5 floor to zero; rescale " +
        "tiny-magnitude embeddings before fitting)")
    var v = Array.tabulate(dim)(d => if (d == startDim) scaleV else BigInt(0))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => at(i, j) * v(j)).sum)
      val m = w.map(_.abs).max
      require(m > 0, "topDirectionFixedPoint: matvec annihilated the " +
        "iterate — degenerate covariance")
      v = w.map(wi => wi.sign * ((wi.abs * scaleV) / m))
    }
    v.map(_.toLong)
  }

  /** Fit mean + top principal direction in one call: two corpus passes
    * (mean, covariance) and a bounded driver iteration. */
  def fit(df: DataFrame, vecCol: String,
          iters: Int = 8): (Array[Double], Array[Long]) = {
    val mean = meanVector(df, vecCol)
    val cov = covarianceUpper(df, vecCol, mean).collect().map { r =>
      (r.getInt(0), r.getInt(1)) ->
        BigInt(r.getDecimal(2).toBigIntegerExact)
    }.toMap
    (mean, topDirectionFixedPoint(cov, mean.length, iters))
  }

  /** Per-dimension mean + SAMPLE standard deviation — the feature-
    * standardization table a pipeline fits before z-scoring (and the
    * diagnostic that catches dead or wild embedding dimensions before
    * clustering/quantization). sigma_i = sqrt((ss_fp(i)/1e9)/(n-1))
    * where ss_fp is the floor-fixed-point sum of squared deviations —
    * the covariance DIAGONAL's arithmetic, but computed in its own
    * single-posexplode pass (no outer product: D groups per task, not
    * D(D+1)/2). sqrt, unlike ln/exp, is IEEE-correctly-rounded in both
    * engines, so no rounding pin is needed anywhere. */
  def dimStats(df: DataFrame, vecCol: String,
               mean: Array[Double]): DataFrame = {
    val centered = zip_with(col(vecCol).cast("array<double>"),
      lit(mean), (x, m) => guarded(x) - m)
    df.select(centered.as("cv"))
      .select(posexplode(col("cv")).as(Seq("i", "cx")))
      .groupBy(col("i"))
      .agg(sum(floor(col("cx") * col("cx") * lit(1e9))
          .cast("decimal(38,0)")).as("ss_fp"),
        count(lit(1)).as("n"))
      .select(col("i"),
        element_at(lit(mean), col("i") + 1).as("mu"),
        sqrt((col("ss_fp").cast("double") / lit(1e9)) /
          (col("n") - 1)).as("sigma"))
  }

  /** z-scored vector: (x - mu)/sigma per element, 6-dp rounded (the
    * cross-engine float rule). A zero-sigma (constant) dimension
    * standardizes to 0 — the scikit-learn StandardScaler convention —
    * instead of the 0/0 NaN the raw division would produce. */
  def standardize(vecCol: Column, mean: Array[Double],
                  sigma: Array[Double]): Column = {
    val centered = zip_with(vecCol.cast("array<double>"),
      lit(mean), (x, m) => x - m)
    zip_with(centered, lit(sigma), (c, s) =>
      when(s === lit(0.0), lit(0.0)).otherwise(round(c / s, 6)))
  }

  /** Projection of each vector onto a fixed-point direction: the
    * codegen'd sequential dot product of the centered vector against
    * the direction rescaled to doubles (exact: the fixed-point longs
    * are < 2^53), rounded to 6 dp (cross-engine float rule; DuckDB's
    * list_inner_product accumulates left-to-right like the DotProduct
    * codegen loop — the sim_lsh_buckets precedent). */
  def projection(vecCol: Column, mean: Array[Double],
                 direction: Array[Long]): Column = {
    val centered = zip_with(vecCol.cast("array<double>"),
      lit(mean), (x, m) => x - m)
    val dir = lit(direction.map(_.toDouble / 1e6))
    round(VectorOps.dot(centered, dir), 6)
  }
}
