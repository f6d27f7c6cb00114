package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._

import graft.ops.Sketches

/** Streaming column profile — the drop monitor a continuously-ingesting
  * corpus runs: per column, the running non-null count, numeric min/max
  * and an HLL distinct ESTIMATE, refreshed every micro-batch. The
  * streaming twin of [[graft.ops.Profile]], with one deliberate delta:
  * EXACT distinct counting is unbounded state on a stream (a value SET
  * per column), so the streaming form carries the register sketch —
  * the same trade [[StreamingDistinct]] documents, keyed here by
  * column name.
  *
  * Shape: every input row explodes ROW-LOCALLY into one observation per
  * profiled column (col_name, is_null, num, hll bucket/rank — the
  * bucket/rank computed by the batch sketch's own codegen'd
  * expressions BEFORE groupByKey), then ONE `mapGroupsWithState` keyed
  * by col_name. State per column is a fixed handful of scalars plus
  * 2^p register bytes — bounded forever, and every merge (add, min,
  * max, register max) is commutative and associative, so arrival order
  * cannot change a batch boundary's emission. Chained streaming
  * aggregations would need event-time watermarks (Spark's
  * multiple-stateful-operator rule); the single stateful operator
  * needs none.
  *
  * Estimates are [[StreamingDistinct.estimateOf]] — the spec-pinned JVM
  * mirror of the batch sketch — so a column's approx_distinct after N
  * batches equals the batch sketch over the union of those batches
  * bit-for-bit. min/max route types exactly like [[graft.ops.Profile]]
  * (numerics as doubles, timestamps as epoch-micros, dates as
  * epoch-days; other types profile count-and-distinct only). */
object StreamingProfile {

  /** One per-column observation from one input row. */
  case class Obs(col_name: String, is_null: Boolean,
                 num: Option[Double], bucket: Int, rank: Int)

  /** Per-column running state: bounded scalars + 2^p register bytes. */
  case class ProfState(n_nonnull: Long, min_v: Option[Double],
                       max_v: Option[Double], regs: Array[Byte])

  /** Per-batch emission for a touched column. */
  case class ColProfile(col_name: String, n_nonnull: Long,
                        min_v: Option[Double], max_v: Option[Double],
                        approx_distinct: Double)

  /** The state-update function, factored out so the unit spec can drive
    * it directly. Null observations count into NOTHING (the batch
    * profiler's semantics: n_nonnull, min/max and distinct are all over
    * observed values); they still arrive so that an all-null batch
    * refreshes the column's emission. min/max compare with
    * `java.lang.Double.compare` — Spark's aggregate ordering, where NaN
    * is GREATER than every value — so a NaN observation leaves min
    * untouched and wins max, exactly as the batch profiler reports
    * (math.min/max would instead poison both with NaN forever). */
  private[streaming] def update(p: Int)(
      key: String, rows: Iterator[Obs],
      state: GroupState[ProfState]): ColProfile = {
    var st = state.getOption.getOrElse(
      ProfState(0L, None, None, new Array[Byte](1 << p)))
    rows.foreach { o =>
      if (!o.is_null) {
        val mn = o.num match {
          case Some(x) => Some(st.min_v.fold(x)(cur =>
            if (java.lang.Double.compare(x, cur) < 0) x else cur))
          case None => st.min_v
        }
        val mx = o.num match {
          case Some(x) => Some(st.max_v.fold(x)(cur =>
            if (java.lang.Double.compare(x, cur) > 0) x else cur))
          case None => st.max_v
        }
        if (o.rank > st.regs(o.bucket)) st.regs(o.bucket) = o.rank.toByte
        st = ProfState(st.n_nonnull + 1, mn, mx, st.regs)
      }
    }
    state.update(st)
    ColProfile(key, st.n_nonnull, st.min_v, st.max_v,
      StreamingDistinct.estimateOf(st.regs, p))
  }

  /** Per-column observation structs (col_name, is_null, num, bucket,
    * rank) — the ONE projection contract behind this GroupState
    * profiler AND [[StreamingCuration]]'s per-batch profile increments
    * (their bit-parity claim depends on both reading the same hashing,
    * null routing, and numeric typing; a second copy could drift). */
  private[streaming] def obsStructs(df: DataFrame, cols: Seq[String],
                                    p: Int): Seq[org.apache.spark.sql.Column] = {
    val names = if (cols.nonEmpty) cols else df.schema.fieldNames.toSeq
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    def q(n: String) = col(s"`$n`")
    names.map { n =>
      val dt = types.getOrElse(n,
        throw new IllegalArgumentException(s"profile: no column $n"))
      val (bucket, rank) =
        Sketches.hllBucketRank(xxhash64(q(n).cast("string")), p)
      struct(
        lit(n).as("col_name"),
        q(n).isNull.as("is_null"),
        // the batch profiler's own type routing — one contract, not two
        graft.ops.Profile.numeric(q(n), dt).as("num"),
        coalesce(bucket, lit(0)).as("bucket"),
        coalesce(rank, lit(0)).as("rank"))
    }
  }

  /** Wire the profiler onto a streaming DataFrame. Update-mode output:
    * one row per touched column per micro-batch with its running
    * profile. `p` is the HLL precision (2^p register bytes per
    * column). */
  def profile(stream: DataFrame, cols: Seq[String] = Nil,
              p: Int = 8): Dataset[ColProfile] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .select(explode(array(obsStructs(stream, cols, p): _*)).as("o"))
      .select(col("o.*"))
      .as[Obs]
      .groupByKey(_.col_name)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update(p))
  }
}
