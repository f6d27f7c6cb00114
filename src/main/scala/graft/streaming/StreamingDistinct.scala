package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

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
  * the result — no watermark is needed for correctness, only for state
  * eviction policy a caller may add.
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
    * the key's current estimate. */
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
}
