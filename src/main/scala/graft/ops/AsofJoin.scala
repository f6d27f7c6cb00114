package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join: every left row picks up the payload of the
  * latest right row with the same key and `rightTime <= leftTime`
  * (inclusive), or nulls when no such row exists — the "most recent
  * quote for each trade" / "last checkpoint before each event" shape.
  *
  * Spark has no ASOF JOIN operator, and the naive encodings are scale
  * hazards: a correlated subquery re-scans the right side per left row,
  * and a range-join (`l.key = r.key AND r.t <= l.t` + max) explodes to
  * the full per-key cross product before aggregating. This is instead
  * the union-scan form: tag both sides, union, and take a running
  * `last(payload, ignoreNulls)` over (key, time) order. Cost is ONE hash
  * exchange of (|L| + |R|) rows on the key plus one sort — the same
  * price as a single window function, no row amplification at any
  * skew. At 100 TB both inputs stream through the sort; no per-key
  * state beyond the current payload struct is held.
  *
  * Payload columns are packed into a single struct before the window so
  * every output column comes from the SAME matched right row (a
  * per-column `last` could mix rows when a payload value is null).
  *
  * Ordering: right rows sort BEFORE left rows at equal time, giving the
  * inclusive `<=` match. Right rows must be unique per (keys, time) —
  * otherwise which same-timestamp row wins is tie-broken by
  * `rightTiebreak` (largest wins; REQUIRED for determinism when
  * duplicates are possible). Null times match nothing on either side
  * (SQL ASOF semantics): null-time right rows are filtered out, and a
  * null-time left row sorts before every right row and takes null
  * payloads.
  */
object AsofJoin {

  /** @param keys         equi-join key columns (same names both sides)
    * @param leftTime     left event-time column name (numeric/orderable)
    * @param rightTime    right event-time column name, same domain
    * @param payload      right columns to carry onto matched left rows
    * @param rightTiebreak column name ordering same-(keys,time) right
    *                      rows; the largest value wins the match
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String, payload: Seq[String],
               rightTiebreak: Option[String] = None): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    val helperCols =
      Seq("_asof_t", "_asof_side", "_asof_tb", "_asof_payload", "_asof_hit")
    require(leftCols.forall(!helperCols.contains(_)),
      s"left columns ${leftCols.filter(helperCols.contains)} collide with " +
        "the join's _asof_* helper columns")
    require(payload.forall(!leftCols.contains(_)),
      s"payload ${payload.filter(leftCols.contains)} collide with left " +
        "columns; rename on the right side first")

    val tb = rightTiebreak.map(col).getOrElse(lit(0L))
    // a null right time can match nothing (mirrors SQL ASOF semantics:
    // the comparison is null); without this filter a null-time row sorts
    // nulls-FIRST and its payload would fabricate a match for every left
    // row that truly has none
    val r = right.where(col(rightTime).isNotNull).select(
      (keys.map(col) :+ col(rightTime).as("_asof_t") :+
        lit(0).as("_asof_side") :+ tb.as("_asof_tb") :+
        struct(payload.map(col): _*).as("_asof_payload")): _*)
    val l = left
      .withColumn("_asof_t", col(leftTime))
      .withColumn("_asof_side", lit(1))
      .withColumn("_asof_tb", lit(0L))

    // allowMissingColumns: left rows get a null payload struct; right
    // rows get nulls for the left columns (dropped by the side filter).
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_t"), col("_asof_side"), col("_asof_tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_asof_hit", last(col("_asof_payload"), ignoreNulls = true)
        .over(w))
      .where(col("_asof_side") === 1)

    val out = payload.foldLeft(matched) { (df, p) =>
      df.withColumn(p, col("_asof_hit").getField(p))
    }
    out.select((leftCols ++ payload).map(col): _*)
  }
}
