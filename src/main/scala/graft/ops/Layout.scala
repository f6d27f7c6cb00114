package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-layout helpers for data skipping. Parquet scans prune files
  * and row groups from min/max statistics; a table range-sorted on ONE
  * column skips well on that column and not at all on any other.
  * Z-ordering interleaves the bits of several columns into one sort key
  * so every participating column's values are locally clustered — the
  * multi-dimensional skipping layout (Delta/Iceberg OPTIMIZE ZORDER; the
  * curves go back to Morton 1966).
  *
  * Usage at write time:
  * {{{
  *   df.withColumn("__z", Layout.zOrder2(col("a"), col("b")))
  *     .repartitionByRange(n, col("__z"))
  *     .sortWithinPartitions("__z")
  *     .drop("__z").write.parquet(path)
  * }}}
  * — one range exchange, the same cost as any global sort write; the
  * skipping payoff is at every subsequent read. [[graft.ops.LayoutSpec]]
  * quantifies it: per-chunk min/max spans shrink on BOTH dimensions vs
  * a single-column sort.
  *
  * [[zOrder2]] is a pure column-function tree (62 shift/mask/or terms,
  * fully inside whole-stage codegen — no UDF, no custom expression), so
  * the oracle replays the interleave bit-for-bit in SQL.
  */
object Layout {

  /** Interleave the low 31 bits of two NON-NEGATIVE integral columns:
    * bit b of `x` lands at z-bit 2b, bit b of `y` at 2b+1, so z stays
    * within a positive signed 64-bit long. Values outside [0, 2^31)
    * fail loudly — silently masking high bits would DESTROY the
    * locality property the caller is buying (distant values would
    * collide), so it is an error, not a clamp. Scale columns into range
    * upstream (e.g. `((v - min) * 2^31 / (max - min + 1))`). */
  def zOrder2(x: Column, y: Column): Column = {
    def guarded(c: Column): Column =
      when(c >= 0 && c < (1L << 31), c.cast("long"))
        .otherwise(raise_error(concat(
          lit("zOrder2: value out of [0, 2^31): "), c.cast("string"))))
    val xs = guarded(x)
    val ys = guarded(y)
    (0 until 31).map { b =>
      shiftleft(shiftright(xs, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(
          shiftleft(shiftright(ys, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** EXACT global rank (1-based) of every row under (`key`, `id`) order
    * — without a global-order window. The naive
    * `row_number().over(Window.orderBy(key, id))` moves the whole
    * corpus into ONE partition; this is the two-phase range form:
    *
    *  - phase 1: bucket every row by the TOP `bucketBits` bits of the
    *    signed 64-bit key (`key >> (64 - bucketBits)` — arithmetic
    *    shift, monotone in the signed key, so bucket order IS key
    *    order) and collect the per-bucket counts — at most
    *    2^bucketBits rows reach the driver whatever the corpus size
    *    (the bounded-table idiom);
    *  - the driver prefix-sums the counts into per-bucket START
    *    offsets, broadcast back;
    *  - phase 2: one window per bucket (corpus/2^bucketBits rows per
    *    partition in expectation for a hash-distributed key) ranks
    *    within the bucket; bucket offset + within-bucket rank = the
    *    exact global rank.
    *
    * (`key`, `id`) must be unique per row — ranks are undefined under
    * ties, so a duplicate pair fails LOUDLY via a count window that
    * shares the bucket exchange (the packSpans guard pattern; the
    * raise rides inside the output column, so pruning cannot drop
    * it). A NULL key fails loudly naming the id.
    *
    * RERUN-DETERMINISM CONTRACT (the tokenBudgetSample contract): the
    * input lineage executes TWICE — once for the phase-1 bucket counts,
    * once under the phase-2 join — so `df` must re-execute to the same
    * rows (deterministic source + deterministic transforms; no
    * rand()/monotonically_increasing_id upstream without a checkpoint).
    * A riding guard raises when growth pushes any rank PAST the
    * phase-1 total (growth in the top bucket, or enough anywhere to
    * overflow the tail) — a partial tripwire, not full detection:
    * growth absorbed by a non-final bucket emits silently DUPLICATED
    * ranks, and shrinkage or within-bucket row swaps are likewise
    * invisible from inside the plan. The guard narrows the silent
    * window; the CONTRACT is what makes ranks correct — checkpoint
    * nondeterministic inputs first. */
  def globalRank(df: DataFrame, id: Column, key: Column,
                 bucketBits: Int = 12,
                 outCol: String = "global_rank"): DataFrame = {
    // lower bound 1: Spark's shiftright masks the shift amount to its
    // low 6 bits (Java long >>), so bucketBits = 0 would shift by
    // 64 & 63 = 0 — every key its OWN bucket, i.e. an unbounded
    // phase-1 collect instead of one bucket
    require(bucketBits >= 1 && bucketBits <= 20,
      s"bucketBits must be in [1, 20], got $bucketBits")
    import org.apache.spark.sql.expressions.Window
    val k = when(key.isNotNull, key.cast("long"))
      .otherwise(raise_error(concat(
        lit("globalRank: NULL key for id "), id.cast("string")))
        .cast("long"))
    val withB = df
      .withColumn("__gr_id", id)
      .withColumn("__gr_k", k)
      .withColumn("__gr_b", shiftright(col("__gr_k"), 64 - bucketBits))
    // phase 1: bounded per-bucket counts -> driver prefix sum
    val counts = withB.groupBy(col("__gr_b"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (bk, n) =>
      val o = (bk, acc); acc += n; o
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toDF("__gr_b", "__gr_off"))
    // phase 2: per-bucket rank + offset; the dup guard's window keys
    // are a superset of the bucket key, so it shares the exchange
    val w = Window.partitionBy(col("__gr_b"))
      .orderBy(col("__gr_k"), col("__gr_id"))
    val dup = count(lit(1)).over(
      Window.partitionBy(col("__gr_b"), col("__gr_k"), col("__gr_id")))
    val total = acc // phase-1 row total, closed over as a literal
    withB.join(offDf, "__gr_b")
      .withColumn(outCol,
        when(dup > 1, raise_error(concat(
          lit("globalRank: duplicate (key, id) pair — ranks are "),
          lit("undefined under ties (offending id: "),
          col("__gr_id").cast("string"), lit(")"))).cast("long"))
          .otherwise(row_number().over(w).cast("long") +
            col("__gr_off")))
      // rerun-determinism tripwire: growth that pushes a rank past the
      // phase-1 total raises instead of silently emitting ranks that
      // disagree with the driver offsets. PARTIAL by construction —
      // growth absorbed by a non-final bucket duplicates ranks without
      // exceeding the total, and shrinkage is invisible (see contract)
      .withColumn(outCol,
        when(col(outCol) > total, raise_error(concat(
          lit("globalRank: rank "), col(outCol).cast("string"),
          lit(s" exceeds phase-1 row total $total — input lineage is "),
          lit("not rerun-deterministic (checkpoint the input)")))
          .cast("long"))
          .otherwise(col(outCol)))
      .drop("__gr_b", "__gr_k", "__gr_id", "__gr_off")
  }

  /** Deterministic EPOCH SHUFFLE for training order: every row gets an
    * exact position in a pseudorandom permutation keyed by
    * xxhash64(id, epoch) — a different, reproducible permutation per
    * epoch, with no global sort and no RNG state (re-runs and
    * re-partitionings give bit-identical positions). This is the
    * ordering step a training-data pipeline runs after packing:
    * shuffle the packed sequences differently each epoch, then
    * range-write by `train_pos`. Returns the input plus `train_pos`
    * (1-based). */
  def epochShuffle(df: DataFrame, id: Column, epoch: Int,
                   bucketBits: Int = 12): DataFrame =
    globalRank(df, id, xxhash64(id, lit(epoch)), bucketBits,
      outCol = "train_pos")
}
