package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic summaries for 100 TB-scale pipelines: a Bloom-filter
  * runtime join filter, a Count-Min sketch for heavy-hitter counting, and
  * a HyperLogLog-style distinct estimator.
  *
  * Design rules shared by all three:
  *  - every hash is Spark's own codegen'd `xxhash64` (seeded through extra
  *    literal arguments), so the sketch construction is deterministic,
  *    rerun-stable, and — via the pre-materialized aux hash tables the
  *    other dedup oracles already use — re-derivable by an external SQL
  *    engine;
  *  - the sketch CONTENT is built relationally (explode → groupBy on a
  *    bounded (row, bucket) key space), which gives map-side partial
  *    aggregation for free and bounds the shuffle at the sketch size, not
  *    the data size;
  *  - estimator arithmetic avoids libm wherever exactness matters: the
  *    HLL harmonic sum is a split integer sum whose halves each stay
  *    exact in int64 and double (see [[hllEstimate]]), and the one
  *    unavoidable `ln`/`log` call is rounded to 6 dp, the repo-wide
  *    cross-engine rule.
  *
  * The relational forms ARE the production paths — a single-buffer
  * Aggregator variant would add nothing here (the bounded groupBy
  * already partial-aggregates map-side to the sketch size); the
  * streaming consumer that genuinely needs per-key sketch STATE is
  * [[graft.streaming.StreamingDistinct]], which holds the HLL registers
  * in GroupState and max-merges micro-batches in.
  */
object Sketches {

  // ======================= Bloom filter ==================================

  /** The k bit positions of `key` in an m-bit Bloom filter, as an
    * array<long> of values in [0, m). k independently seeded xxhash64
    * probes (the seed rides as an extra hashed literal) — no wrap-around
    * arithmetic, so the construction is ANSI-mode safe; pmod keeps every
    * position non-negative. */
  def bloomPositions(key: Column, m: Int, k: Int): Column =
    array(probePositions(key, m, k): _*)

  /** The shared probe-position family — build and membership MUST derive
    * from this one definition: drift between them would give the filter
    * false NEGATIVES, i.e. silent row loss through [[prunedJoin]]. */
  private def probePositions(key: Column, m: Int, k: Int): Seq[Column] = {
    require(m > 0 && k > 0, s"need m > 0 and k > 0, got m=$m k=$k")
    (0 until k).map(i =>
      pmod(xxhash64(key, lit(0x9E3779B9L + i)), lit(m.toLong)))
  }

  /** Build the filter over the keys of `keys` and return the packed
    * bitset. Duplicate key occurrences are harmless (bit_or is
    * idempotent) and are deliberately NOT deduplicated: a `.distinct()`
    * would cost an extra exchange on the build side, while duplicate
    * probe rows collapse map-side in the bounded groupBy below. The
    * build is one bounded aggregation: explode the k positions, OR the
    * single-bit masks per 64-bit word — at most ceil(m/64) rows ever
    * reach the driver, whatever the key count.
    * This is the runtime-filter build a broadcast-join prune wants: the
    * collected bitset is injected into the big side's scan as a literal,
    * so the prune costs zero joins and zero shuffles. */
  def buildBloom(keys: DataFrame, key: Column, m: Int, k: Int): Array[Long] = {
    val words = keys
      .select(explode(bloomPositions(key, m, k)).as("pos"))
      .select(
        (col("pos") / 64).cast("int").as("word"),
        call_function("shiftleft", lit(1L),
          pmod(col("pos"), lit(64L)).cast("int")).as("mask"))
      .groupBy("word").agg(bit_or(col("mask")).as("bits"))
      .collect()
    val arr = new Array[Long]((m + 63) / 64)
    words.foreach(r => arr(r.getInt(0)) = r.getLong(1))
    arr
  }

  /** Membership test against a driver-held bitset, as a pure codegen
    * column: k bit probes into an array<long> literal, AND-ed. No false
    * negatives; false positives at the usual (1-e^{-kn/m})^k rate — so a
    * prune using this MUST be followed by the exact join, which this
    * engine's [[prunedJoin]] does. */
  def mightContain(bits: Array[Long], m: Int, k: Int, key: Column): Column = {
    val bitsLit = typedLit(bits.toSeq)
    probePositions(key, m, k).map { pos =>
      val word = element_at(bitsLit, (pos / 64).cast("int") + 1)
      val bitIdx = pmod(pos, lit(64L)).cast("int")
      pmod(call_function("shiftrightunsigned", word, bitIdx), lit(2L)) === 1
    }.reduce(_ && _)
  }

  /** Equi-join with a Bloom prune on the big side: build the filter from
    * the small side's join keys, filter `big` with the literal bitset
    * BEFORE the join (the predicate rides the scan — at 100 TB the rows a
    * 1%-selective dimension would drop never enter the exchange), then
    * run the exact join, which removes the false positives. Semantically
    * identical to `big.join(small, keys)` — that identity is the oracle.
    */
  def prunedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, m: Int = 1 << 16, k: Int = 5): DataFrame = {
    // DataFrame-qualified key references: bare col(...) === col(...)
    // would be ambiguous (AnalysisException) whenever both sides use the
    // same key column name
    val bits = buildBloom(small, small(smallKey), m, k)
    val pruned = big.where(mightContain(bits, m, k, big(bigKey)))
    pruned.join(small, pruned(bigKey) === small(smallKey))
  }

  // ======================= Count-Min sketch ==============================

  /** The depth bucket coordinates of `key`: array of (row, bucket) structs,
    * row j using xxhash64(key, j). */
  def cmsBuckets(key: Column, depth: Int, width: Int): Column = {
    require(depth > 0 && width > 0, s"need depth/width > 0, got $depth/$width")
    array((0 until depth).map { j =>
      struct(lit(j).as("row"),
        pmod(xxhash64(key, lit(j)), lit(width.toLong)).cast("int").as("bucket"))
    }: _*)
  }

  /** Build the (row, bucket) → count table: ONE aggregation on a key space
    * bounded by depth×width (map-side combine collapses each partition to
    * at most depth×width rows before the shuffle — the sketch property
    * that makes this viable at any corpus size). `weight` defaults to 1
    * per input row. */
  def cmsSketch(df: DataFrame, key: Column, depth: Int, width: Int,
                weight: Column = lit(1L)): DataFrame =
    df.select(explode(cmsBuckets(key, depth, width)).as("rb"), weight.as("w"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(sum(col("w")).as("cnt"))

  /** Point estimates for `keys` (a DataFrame with column `keyCol`): the
    * CMS guarantee est >= true count, with overestimation only on bucket
    * collisions. Left join against the sketch (a bucket never touched
    * counts 0), min across the depth rows. */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
                  depth: Int, width: Int): DataFrame = {
    val probes = keys
      .select(col(keyCol), explode(cmsBuckets(col(keyCol), depth, width)).as("rb"))
      .select(col(keyCol), col("rb.row").as("row"), col("rb.bucket").as("bucket"))
    probes.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  // ======================= HyperLogLog ===================================

  /** Bucket index (low p bits) and rank for one 64-bit hash. Rank is the
    * position of the least-significant set bit of the remaining 64-p bits,
    * plus one (a geometric observable, as in PCSA/HLL); an all-zero
    * remainder takes the saturated rank 65-p. The lowest-set-bit isolate
    * `rest & -rest` is an exact power of two <= 2^(63-p), so the
    * `log2` that turns it into a bit index is exact after round(). */
  def hllBucketRank(hash: Column, p: Int): (Column, Column) = {
    require(p >= 4 && p <= 16, s"need 4 <= p <= 16, got $p")
    val m = 1L << p
    val bucket = pmod(hash, lit(m)).cast("int")
    val rest = call_function("shiftrightunsigned", hash, lit(p))
    val lowbit = rest.bitwiseAND(-rest)
    val rank = when(rest === 0, lit(65 - p))
      .otherwise(round(log2(lowbit)).cast("int") + 1)
    (bucket, rank)
  }

  /** Per-group registers: for each value of `groupCols`, the max rank seen
    * in each occupied bucket. ONE aggregation on (group, bucket) — the
    * shuffle is bounded by |groups| × m rows regardless of input size,
    * and max() combines map-side. This register table IS the mergeable
    * sketch: union two register tables and re-max to merge corpora. */
  def hllRegisters(df: DataFrame, key: Column, p: Int,
                   groupCols: Seq[Column] = Seq.empty): DataFrame = {
    val (bucket, rank) = hllBucketRank(xxhash64(key), p)
    df.select(groupCols :+ bucket.as("bucket") :+ rank.as("rank"): _*)
      .groupBy(groupCols :+ col("bucket"): _*)
      .agg(max(col("rank")).as("register"))
  }

  /** Distinct-count estimate per group from a register table. The
    * harmonic sum of 2^-register is computed EXACTLY and
    * engine-independently: each term is the integer 2^(SCALE-register)
    * with SCALE = 65-p (the saturated rank, so the smallest term scales
    * to 1), split at bit 12 into high/low halves whose per-group sums are
    * each <= m * 2^(SCALE-12) = 2^53 — exact in int64 AND in double, with
    * no >53-bit integer→double cast anywhere (the repo's winnowing oracle
    * found DuckDB's wide-int→double cast off by one ulp, so the sketch
    * oracle must never take one). Recombining costs exactly one
    * correctly-rounded double add; the division by 2^SCALE is exact.
    * Small-range (linear counting) correction applies below 2.5m when
    * empty buckets remain; its single ln() is covered by the 6 dp output
    * rounding, the repo-wide rule. */
  def hllEstimate(registers: DataFrame, p: Int,
                  groupCols: Seq[Column] = Seq.empty): DataFrame = {
    val m = 1 << p
    val scale = 65 - p
    val split = 12
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val sh = lit(scale) - col("register") // in [0, scale-1]
    val termHigh = when(sh >= split,
      call_function("shiftleft", lit(1L), (sh - split).cast("int")))
      .otherwise(lit(0L))
    val termLow = when(sh < split,
      call_function("shiftleft", lit(1L), sh.cast("int")))
      .otherwise(lit(0L))
    // coalesce: a global (no-group) aggregate over an EMPTY register
    // table yields one row with null sums — zero occupied buckets must
    // read as sums 0 so the linear-counting branch returns est 0
    val agg = registers.groupBy(groupCols: _*).agg(
      coalesce(sum(termHigh), lit(0L)).as("sum_high"),
      coalesce(sum(termLow), lit(0L)).as("sum_low"),
      count(lit(1)).as("occupied"))
    val zeros = lit(m.toLong) - col("occupied")
    val harmonic =
      ((col("sum_high") + zeros * lit(1L << (scale - split))).cast("double") *
        lit(math.pow(2.0, split)) + col("sum_low").cast("double")) /
        lit(math.pow(2.0, scale))
    val raw = lit(alpha * m.toDouble * m.toDouble) / harmonic
    val est = when(zeros > 0 && raw <= lit(2.5 * m),
        lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
    agg.select(groupCols :+ round(est, 6).as("hll_est"): _*)
  }

  // ============== equi-width histogram quantile sketch ===================

  /** Bounded equi-width histogram over [lo, hi): the mergeable,
    * single-pass complement to the EXACT rank-selection percentile
    * ([[graft.ops.PercentileAgg.percentileSelect]]). The exact form
    * routes extra jobs to locate ranks; this sketch is ONE aggregation
    * whose shuffle is bounded by |groups| × m rows regardless of input
    * size (map-side combine collapses each partition to the sketch), and
    * two count tables union+re-sum to merge corpora — the shape to
    * monitor a quantile over 100 TB or across incremental loads.
    *
    * bucket = floor((x - lo) / width) clamped to [0, m-1]; values
    * outside [lo, hi) saturate into the edge buckets — a DOCUMENTED
    * bias: a quantile landing in clamped mass degrades to the edge
    * bucket's estimate. Pick lo/hi from domain knowledge; the error of
    * an in-range estimate is at most one bucket width.
    */
  def histCounts(df: DataFrame, value: Column, lo: Double, hi: Double,
                 m: Int, groupCols: Seq[Column] = Seq.empty): DataFrame = {
    require(m > 0 && hi > lo, s"need m > 0 and hi > lo, got m=$m [$lo,$hi)")
    val width = (hi - lo) / m
    val bucket = least(greatest(
      floor((value.cast("double") - lit(lo)) / lit(width)).cast("int"),
      lit(0)), lit(m - 1))
    df.select(groupCols :+ bucket.as("bucket"): _*)
      .groupBy(groupCols :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Interpolated quantile estimates from a [[histCounts]] sketch: for
    * each q the 1-based target rank is ceil(q·N) (floored at 1), the
    * containing bucket is the one whose cumulative count first reaches
    * it, and the estimate interpolates linearly inside that bucket —
    * `lo + width · (bucket + (rank − cum_before) / cnt)`, rounded to
    * 6 dp (the repo-wide cross-engine rule). All selection arithmetic is
    * integer; the windows run over ≤ m rows per group — sketch-sized,
    * never data-sized. Output: (group…, q, est).
    */
  def histQuantiles(counts: DataFrame, qs: Seq[Double], lo: Double,
                    hi: Double, m: Int,
                    groupCols: Seq[Column] = Seq.empty): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1], got $qs")
    val width = (hi - lo) / m
    val wCum = Window.partitionBy(groupCols: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols: _*)
    val cum = counts
      .withColumn("__hq_cum", sum(col("cnt")).over(wCum))
      .withColumn("__hq_n", sum(col("cnt")).over(wAll))
    cum
      .select(col("*"), explode(array(qs.map(lit): _*)).as("q"))
      .withColumn("__hq_rank",
        greatest(ceil(col("q") * col("__hq_n")).cast("long"), lit(1L)))
      .where(col("__hq_cum") >= col("__hq_rank") &&
        col("__hq_cum") - col("cnt") < col("__hq_rank"))
      .select(groupCols.map(c => col(c.toString)) ++ Seq(col("q"),
        round(lit(lo) + lit(width) * (col("bucket") +
          (col("__hq_rank") - (col("__hq_cum") - col("cnt"))).cast("double") /
            col("cnt")), 6).as("est")): _*)
  }
}
