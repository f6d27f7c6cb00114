package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Sketches

/** Streaming distinct-count per key — the stateful form of the
  * [[graft.ops.Sketches]] HyperLogLog: per-key registers live in
  * `GroupState`, each micro-batch max-merges its observations in, and an
  * updated estimate is emitted per touched key per batch (Update mode).
  *
  * Scale posture: state per key is EXACTLY 2^p bytes (256 at p=8) —
  * forever, whatever the number of distinct values a key accumulates.
  * That bound is the whole point: an exact streaming distinct would hold
  * a per-key value SET, which is state that grows with history and can
  * never be dropped. The register merge is commutative/associative/
  * idempotent (max), so replays and out-of-order arrival cannot change
  * the result — no watermark is needed for correctness. Eviction is a
  * POLICY choice: [[estimates]] keeps every key forever (bounded key
  * domains), [[estimatesWithTtl]] drops keys idle past a TTL so
  * unbounded key domains cannot accumulate unbounded total state.
  *
  * Cross-path parity: the bucket/rank columns are computed BEFORE
  * `groupByKey` by the very same codegen'd expressions the batch sketch
  * uses ([[Sketches.hllBucketRank]]), and [[estimateOf]] mirrors
  * [[Sketches.hllEstimate]]'s arithmetic operation-for-operation
  * (identical split-sum harmonic, identical rounding), so the streaming
  * estimate after N batches is BIT-IDENTICAL to the batch estimate over
  * the union of those batches — spec-pinned. */
object StreamingDistinct {

  /** One observation: count distinct `value`s per `key`. */
  case class Observation(key: String, value: Long)

  /** Pre-hashed row after the codegen projection. */
  case class BucketRank(key: String, bucket: Int, rank: Int)

  /** Per-key state: 2^p HLL registers. */
  case class Registers(regs: Array[Byte])

  /** Per-batch emission for a touched key. */
  case class Estimate(key: String, hllEst: Double, occupied: Int)

  /** JVM mirror of [[Sketches.hllEstimate]] — same split-sum harmonic
    * (exact: both partial sums stay <= 2^53), same operation order, and
    * Spark's own `round` semantics (BigDecimal.valueOf, HALF_UP) so the
    * two paths agree to the last bit. */
  def estimateOf(regs: Array[Byte], p: Int): Double = {
    val m = 1 << p
    val scale = 65 - p
    val split = 12
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sumHigh = 0L
    var sumLow = 0L
    var occupied = 0
    var i = 0
    while (i < regs.length) {
      val r = regs(i).toInt
      if (r > 0) {
        occupied += 1
        val sh = scale - r
        if (sh >= split) sumHigh += 1L << (sh - split)
        else sumLow += 1L << sh
      }
      i += 1
    }
    val zeros = m - occupied
    val harmonic =
      ((sumHigh + zeros.toLong * (1L << (scale - split))).toDouble *
        math.pow(2.0, split) + sumLow.toDouble) / math.pow(2.0, scale)
    val raw = alpha * m.toDouble * m.toDouble / harmonic
    val est =
      if (zeros > 0 && raw <= 2.5 * m)
        m.toDouble * math.log(m.toDouble / zeros.toDouble)
      else raw
    java.math.BigDecimal.valueOf(est)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** The state-update function, factored out so the unit spec can drive
    * it directly. */
  private[streaming] def update(p: Int)(
      key: String, rows: Iterator[BucketRank],
      state: GroupState[Registers]): Estimate = {
    val regs = state.getOption.map(_.regs)
      .getOrElse(new Array[Byte](1 << p))
    rows.foreach { r =>
      if (r.rank > regs(r.bucket)) regs(r.bucket) = r.rank.toByte
    }
    state.update(Registers(regs))
    Estimate(key, estimateOf(regs, p), regs.count(_ > 0))
  }

  /** Wire the estimator onto a streaming Dataset of observations.
    * Update-mode output: one row per touched key per micro-batch with
    * the key's current estimate.
    *
    * BOUNDED-KEYS ASSUMPTION: this NoTimeout form holds one register
    * array per key FOREVER — per-key state is a perfect 2^p bytes, but
    * the key SET grows with history, so a stream whose key domain is
    * unbounded (session ids, URLs) accumulates unbounded total state.
    * Use it when keys are a bounded dimension (tenants, languages,
    * sources); otherwise use [[estimatesWithTtl]]. */
  def estimates(spark: SparkSession, obs: Dataset[Observation],
                p: Int = 8): Dataset[Estimate] = {
    import spark.implicits._
    val (bucket, rank) = Sketches.hllBucketRank(xxhash64(col("value")), p)
    obs
      .select(col("key"), bucket.as("bucket"), rank.as("rank"))
      .as[BucketRank]
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update(p))
  }

  /** The TTL update function, factored out so the unit spec can drive
    * it directly (including the timeout path) through Spark's
    * `TestGroupState`. A timed-out key REMOVES its registers and emits
    * nothing; a live key merges, re-arms its processing-time timer, and
    * emits. After eviction a re-appearing key starts from empty
    * registers — its estimate reflects only post-eviction observations
    * (the documented semantics: the estimator forgets, it does not
    * resurrect). */
  private[streaming] def updateTtl(p: Int, ttlMs: Long)(
      key: String, rows: Iterator[BucketRank],
      state: GroupState[Registers]): Iterator[Estimate] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      // DELEGATE to the NoTimeout update: in-window parity with
      // [[estimates]] is then true by construction, not by two copies
      // staying in sync
      val est = update(p)(key, rows, state)
      state.setTimeoutDuration(ttlMs)
      Iterator.single(est)
    }
  }

  /** TTL-evicting variant of [[estimates]] for UNBOUNDED key domains:
    * a key idle for `ttl` (processing time) has its registers dropped,
    * so total state is bounded by the number of keys ACTIVE within one
    * TTL window — not by history. Inside the window the estimate is
    * bit-identical to the NoTimeout form (same merge, same arithmetic);
    * a key that returns after eviction re-estimates from its new
    * observations only. Update-mode output; evictions emit nothing
    * (consumers keep the last estimate, exactly as they would for a key
    * that simply went quiet).
    *
    * Operational note: with ProcessingTimeTimeout Spark conservatively
    * schedules NO-DATA micro-batches so due timeouts fire even on a
    * quiet stream — that is the eviction mechanism working, but it
    * means drain-style test harnesses (`processAllAvailable` under the
    * default immediate trigger) never see the stream settle; run this
    * form with a processing-time trigger in production, and spec it at
    * the update-function level (as StreamingDistinctSpec does). */
  def estimatesWithTtl(spark: SparkSession, obs: Dataset[Observation],
                       ttl: java.time.Duration,
                       p: Int = 8): Dataset[Estimate] = {
    import spark.implicits._
    require(!ttl.isNegative && !ttl.isZero, s"need a positive ttl, got $ttl")
    val (bucket, rank) = Sketches.hllBucketRank(xxhash64(col("value")), p)
    obs
      .select(col("key"), bucket.as("bucket"), rank.as("rank"))
      .as[BucketRank]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.ProcessingTimeTimeout)(updateTtl(p, ttl.toMillis))
  }
}
