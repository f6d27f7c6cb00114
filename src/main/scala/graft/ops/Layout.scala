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
}
