package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sort-based exact (median, MAD, count) — the Tungsten-sort alternative
  * to [[MedianMadAgg]]'s buffering Aggregator.
  *
  * The Aggregator form is an ObjectHashAggregate: every group's values are
  * buffered in a kryo-serialized Array[Double], shipped through the
  * shuffle as opaque blobs, merged by arraycopy and sorted per group at
  * finish. At 33 M rows x ~10k (frame, q_bin) groups that serialization
  * round-trip is the dominant cost of the shared A8 stats pass
  * (SCALE_r06.md next-lever #1).
  *
  * This form never leaves Tungsten until the per-group finish: hash
  * repartition on the group keys, radix sortWithinPartitions on
  * (keys..., value), then ONE streaming pass over raw InternalRows that
  * closes a group per key change. Because values arrive ascending, the
  * median is an index lookup and the MAD is an O(n) two-pointer merge of
  * the two monotone distance sequences around the median — no JVM sort,
  * no kryo, no per-group buffer growth beyond one group (the same
  * stream-one-group bound as the reference's counting-sort + quickselect
  * kernel, fmask.c:33-77, distributed per partition).
  *
  * Semantics match [[MedianMadAgg]] bit-for-bit on NaN-free input (linear
  * interpolation at even counts, null values skipped like the builtin
  * `median`); groups containing NaN fall back to the Aggregator's
  * sort-the-distances path so ordering semantics stay identical
  * (Arrays.sort places NaN last, exactly like the Tungsten sort).
  * Output: keys..., med, n, mad — drop-in for
  * [[RobustStats.medianMadOnePass]].
  */
object SortedMedianMad {

  def medianMad(df: DataFrame, keys: Seq[String], value: String): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow,
      JoinedRow, UnsafeProjection, UnsafeRow}
    import org.apache.spark.sql.types._
    require(keys.nonEmpty, "medianMadSorted needs at least one group key")
    val spark = df.sparkSession
    val kcols = keys.map(col)
    val slim = df.where(col(value).isNotNull)
      .select(kcols :+ col(value).cast("double").as("_v"): _*)
    val parts = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // explicit partition count: whole groups co-locate, AQE never
    // coalesces the exchange under the kernel's feet
    val sorted = slim.repartition(parts, kcols: _*)
      .sortWithinPartitions((keys :+ "_v").map(col): _*)
    val inSchema = sorted.schema
    val nk = keys.size
    val keyFields = inSchema.fields.take(nk)
    val outSchema = StructType(keyFields.toIndexedSeq ++ Seq(
      StructField("med", DoubleType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("mad", DoubleType, nullable = false)))

    val outRdd = sorted.queryExecution.toRdd.mapPartitions { it =>
      new Iterator[InternalRow] {
        // keys are the row prefix, so a DataType-array projection reads
        // exactly the key fields
        private val keyProj =
          UnsafeProjection.create(keyFields.map(_.dataType))
        private val outProj =
          UnsafeProjection.create(outSchema.fields.map(_.dataType))
        private val stats = new GenericInternalRow(3)
        private val joined = new JoinedRow
        private var buf = new Array[Double](1024)
        private var n = 0
        private var stashedKey: UnsafeRow = null
        private var stashedVal = 0.0

        private def push(v: Double): Unit = {
          if (n == buf.length) {
            buf = java.util.Arrays.copyOf(buf, buf.length * 2)
          }
          buf(n) = v; n += 1
        }

        /** Interpolated median of the ascending prefix vs[0..m). */
        private def medianSorted(vs: Array[Double], m: Int): Double =
          if (m % 2 == 1) vs(m / 2)
          else {
            val a = vs(m / 2 - 1); val b = vs(m / 2)
            a + (b - a) * 0.5 // MedianMadAgg/Spark percentile interpolation
          }

        /** Median of |v - med| for ascending vs[0..m): two-pointer merge
          * of the distances left/right of med — both sequences are
          * monotone, so the k-th smallest distance pops in order. The
          * FP identities hold exactly: for v <= med,
          * abs(v - med) == med - v in IEEE, so the popped distances are
          * bit-identical to the Aggregator's abs()+sort path. */
        private def madSorted(vs: Array[Double], m: Int,
                              med: Double): Double = {
          if (java.lang.Double.isNaN(med) ||
              java.lang.Double.isNaN(vs(m - 1))) {
            // NaN-bearing group: defer to the reference path (sort puts
            // NaN last, matching the Aggregator exactly)
            val ds = new Array[Double](m)
            var i = 0
            while (i < m) { ds(i) = math.abs(vs(i) - med); i += 1 }
            java.util.Arrays.sort(ds)
            return medianSorted(ds, m)
          }
          var lo = m / 2
          while (lo < m - 1 && vs(lo + 1) <= med) lo += 1
          while (lo >= 0 && vs(lo) > med) lo -= 1
          var hi = lo + 1
          val m1 = (m - 1) / 2; val m2 = m / 2
          var popped = 0; var d1 = 0.0; var d2 = 0.0
          while (popped <= m2) {
            val dl = if (lo >= 0) med - vs(lo) else Double.PositiveInfinity
            val dr = if (hi < m) vs(hi) - med else Double.PositiveInfinity
            val d = if (dl <= dr) { lo -= 1; dl } else { hi += 1; dr }
            if (popped == m1) d1 = d
            if (popped == m2) d2 = d
            popped += 1
          }
          if (m1 == m2) d1 else d1 + (d2 - d1) * 0.5
        }

        private def emit(key: UnsafeRow): InternalRow = {
          val med = medianSorted(buf, n)
          stats.update(0, med)
          stats.update(1, n.toLong)
          stats.update(2, madSorted(buf, n, med))
          n = 0
          outProj(joined(key, stats))
        }

        def hasNext: Boolean = stashedKey != null || it.hasNext

        def next(): InternalRow = {
          var cur = stashedKey
          if (cur != null) { push(stashedVal); stashedKey = null }
          else {
            val r = it.next()
            cur = keyProj(r).copy(); push(r.getDouble(nk))
          }
          var open = true
          while (open && it.hasNext) {
            val r = it.next()
            val k = keyProj(r)
            if (k == cur) push(r.getDouble(nk))
            else {
              stashedKey = k.copy(); stashedVal = r.getDouble(nk)
              open = false
            }
          }
          emit(cur)
        }
      }
    }
    org.apache.spark.sql.graftshim.Internals
      .internalCreateDataFrame(spark, outRdd, outSchema)
  }
}
