package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** One-pass column profiler: exact counts against hand-computed truth,
  * type routing for min/max, and partitioning invariance. */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  // instants fixed by epoch millis — no JVM-default-timezone parsing
  private val t0 = new Timestamp(1704067200000L) // 2024-01-01T00:00:00Z
  private val t1 = new Timestamp(1717243200000L) // 2024-06-01T12:00:00Z

  private val rows = Seq(
    (1L, Some(10.5), Some("a"), Some(t0)),
    (2L, Some(-3.25), Some("b"), Some(t1)),
    (3L, None, Some("a"), None),
    (4L, Some(10.5), None, Some(t0)))

  private def df = rows.toDF("id", "x", "s", "ts")

  test("profile counts nulls, exact distincts, and numeric min/max") {
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4))))
      .toMap
    assert(p("id") == ((4L, 4L, Some(1.0), Some(4.0))))
    // x: one null, {10.5, -3.25} distinct
    assert(p("x") == ((3L, 2L, Some(-3.25), Some(10.5))))
    // s: strings carry NULL min/max (no cross-engine-stable numeric form)
    assert(p("s") == ((3L, 2L, None, None)))
  }

  test("timestamps profile as epoch-micros doubles (UTC session)") {
    val p = Profile.profile(df, Seq("ts")).collect().head
    assert(p.getLong(1) == 3L && p.getLong(2) == 2L)
    assert(p.getDouble(3) == 1704067200L * 1e6)
    assert(p.getDouble(4) == 1717243200L * 1e6)
  }

  test("profile is partitioning-invariant") {
    val a = Profile.profile(df).orderBy("col_name").collect().toSeq
    val b = Profile.profile(df.repartition(7)).orderBy("col_name")
      .collect().toSeq
    assert(a == b)
  }

  test("an unknown column fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Profile.profile(df, Seq("nope"))
    }
    assert(e.getMessage.contains("no column nope"))
  }

  test("dates profile as epoch-days doubles") {
    val d = Seq(java.sql.Date.valueOf("1970-01-11"),
      java.sql.Date.valueOf("1969-12-31")).toDF("d")
    val p = Profile.profile(d).collect().head
    assert(p.getDouble(3) == -1.0 && p.getDouble(4) == 10.0)
  }

  test("column names containing dots profile fine (crawled-corpus " +
    "field names)") {
    val dotted = rows.toDF("meta.id", "x", "s", "ts")
    val p = Profile.profile(dotted, Seq("meta.id")).collect().head
    assert(p.getString(0) == "meta.id" && p.getLong(1) == 4L &&
      p.getLong(2) == 4L && p.getDouble(3) == 1.0 && p.getDouble(4) == 4.0)
  }
}
