package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Gap-based sessionization: assign a session index to every row so that
  * consecutive rows of the same key belong to one session iff the time
  * gap between them is at most `gapNs`.
  *
  * The classic two-window form: `lag` marks session starts, a running
  * sum over the marks numbers them. Both windows share ONE partitioning
  * (the key columns), so the whole operator is a single hash exchange on
  * the key — the minimum any per-key ordering computation can pay — and
  * both window passes run inside the same sort, pipelined. At 100 TB the
  * shuffle is by user/entity key (high cardinality, naturally parallel);
  * no state is ever global, so the operator scales with executors.
  * Streaming note: the batch form here is the oracle shape; a streaming
  * deployment maps the same semantics onto
  * `flatMapGroupsWithState`-style timeout state per key.
  *
  * Semantics: a row STARTS a new session when it has no predecessor or
  * when `ts - prev_ts > gapNs` (a gap of exactly `gapNs` stays in the
  * session). Session indices are 1-based per key, in time order; ties in
  * `tsNs` are ordered by `tiebreak` (supply one whenever timestamps can
  * collide, or session numbering is nondeterministic).
  */
object Sessions {

  /** Adds `session_idx` (1-based Long per key) to `df`.
    *
    * @param keys     session scope (e.g. user id) — the shuffle key
    * @param tsNs     event time as comparable numeric (epoch-nanos)
    * @param gapNs    max in-session gap; `> gapNs` starts a new session
    * @param tiebreak total-order tiebreak within equal timestamps
    */
  def sessionize(df: DataFrame, keys: Seq[String], tsNs: Column,
                 gapNs: Long, tiebreak: Seq[Column] = Nil): DataFrame = {
    val order = tsNs +: tiebreak
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val prev = lag(tsNs, 1).over(w)
    val isNew = when(prev.isNull || tsNs - prev > gapNs, 1L).otherwise(0L)
    df.withColumn("session_idx",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** Per-session rollup: bounds, duration, row count, and an exact
    * decimal-routed sum of `valueCol` (order-independent, so the result
    * is identical under any partitioning). One additional exchange on
    * (keys, session_idx) — same leading key as the sessionize shuffle,
    * so AQE/bucketing can often colocate it.
    */
  def sessionStats(df: DataFrame, keys: Seq[String], tsNs: Column,
                   gapNs: Long, valueCol: Column,
                   tiebreak: Seq[Column] = Nil): DataFrame = {
    val sessions = sessionize(df, keys, tsNs, gapNs, tiebreak)
      .withColumn("_ts", tsNs)
    sessions.groupBy((keys.map(col) :+ col("session_idx")): _*)
      .agg(count(lit(1)).as("n"),
        min(col("_ts")).as("start_ns"),
        max(col("_ts")).as("end_ns"),
        (max(col("_ts")) - min(col("_ts"))).as("duration_ns"),
        sum(valueCol.cast("decimal(18,4)")).cast("double").as("value_sum"))
  }
}
