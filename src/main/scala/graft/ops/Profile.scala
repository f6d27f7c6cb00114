package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass column profiler — the SUMMARIZE-style data-quality scan a
  * curation pipeline runs before trusting a new drop: per column, the
  * non-null count, exact distinct count, and (for numeric/timestamp
  * columns) min/max. The whole profile is ONE aggregate over one scan:
  *
  *  - plain aggregates (count/min/max) partial-aggregate map-side, so
  *    each task contributes one row to the exchange;
  *  - the exact distinct counts rewrite through Catalyst's Expand —
  *    the scan is widened ×k (k = profiled columns) BEFORE the partial
  *    aggregate, which then collapses each task's contribution to its
  *    distinct (gid, value) pairs. At 100 TB the exchange therefore
  *    carries per-task distinct values, not ×k data rows — the exact
  *    price of an exact profile. When an estimate suffices at scale,
  *    swap `countDistinct` for `approx_count_distinct` and the Expand
  *    disappears entirely; the exact form stays the default because it
  *    is oracle-checkable bit-for-bit.
  *
  * Output is long format, one row per column: (col_name, n_nonnull,
  * n_distinct, min_v, max_v). min/max are surfaced as doubles (exact
  * for the integral/epoch-micros domains involved: < 2^53); non-numeric
  * columns carry NULL there rather than a stringified value, because
  * double→string formatting is NOT cross-engine deterministic while the
  * double VALUE of a selected element is.
  */
object Profile {

  /** min/max of `c` as a double, or a typed NULL for types where an
    * order statistic has no deterministic numeric form. Timestamps go
    * through epoch-micros, dates through epoch-days (exact integers →
    * exact doubles below 2^53);
    * NTZ timestamps (what parquet timestamp-without-timezone infers to)
    * are interpreted in the session timezone — pin it to UTC (as every
    * entry point in this repo does) so the profile is host-invariant. */
  private[graft] def numeric(c: Column, dt: DataType): Column = dt match {
    case _: NumericType => c.cast("double")
    case _: TimestampType => unix_micros(c).cast("double")
    case TimestampNTZType => unix_micros(c.cast("timestamp")).cast("double")
    case DateType => unix_date(c).cast("double") // epoch-days, exact
    case _ => lit(null).cast("double")
  }

  /** The one-aggregate profile of `cols` (default: every column). */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.schema.fieldNames.toSeq
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // backtick-quoted references: a profiled column NAME may contain
    // dots/spaces (nested-looking parquet field names are common in
    // crawled corpora), and so may the derived aliases
    def q(n: String) = col(s"`$n`")
    val aggs = names.flatMap { n =>
      val dt = types.getOrElse(n,
        throw new IllegalArgumentException(s"profile: no column $n"))
      Seq(
        count(q(n)).as(s"${n}__n"),
        countDistinct(q(n)).as(s"${n}__d"),
        min(numeric(q(n), dt)).as(s"${n}__min"),
        max(numeric(q(n), dt)).as(s"${n}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = names.map { n =>
      struct(
        lit(n).as("col_name"),
        q(s"${n}__n").as("n_nonnull"),
        q(s"${n}__d").as("n_distinct"),
        q(s"${n}__min").as("min_v"),
        q(s"${n}__max").as("max_v"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
  }
}
