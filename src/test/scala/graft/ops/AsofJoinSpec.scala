package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Backward as-of join semantics: inclusive <= match, per-key scoping,
  * null payloads when no prior right row, atomic payload (all columns
  * from ONE right row), duplicate-timestamp tiebreak. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    ("k1", 5L, "l1"), ("k1", 10L, "l2"), ("k1", 20L, "l3"),
    ("k2", 10L, "l4"), // k2 has a right row only later -> null
    ("k3", 7L, "l5")   // k3 has no right rows at all
  ).toDF("key", "t", "lname")

  private def right = Seq(
    ("k1", 4L, 100L, 1.5), ("k1", 10L, 200L, 2.5), ("k1", 15L, 300L, 3.5),
    ("k2", 50L, 400L, 4.5)
  ).toDF("key", "rt", "rid", "rv")

  test("inclusive backward match per key, null when no prior row") {
    val out = AsofJoin.backward(left, right, Seq("key"), "t", "rt",
        payload = Seq("rid", "rv"))
      .select("key", "lname", "rid", "rv")
      .as[(String, String, Option[Long], Option[Double])]
      .collect().sortBy(_._2)
    assert(out.toSeq == Seq(
      ("k1", "l1", Some(100L), Some(1.5)),  // 4 <= 5, latest
      ("k1", "l2", Some(200L), Some(2.5)),  // equal time matches (<=)
      ("k1", "l3", Some(300L), Some(3.5)),  // 15 <= 20
      ("k2", "l4", None, None),             // right row only at t=50
      ("k3", "l5", None, None)))            // no right rows for key
  }

  test("payload columns come from the same right row (atomic struct)") {
    // right row at rt=10 carries a NULL rv; a per-column last(ignoreNulls)
    // would leak rv=1.5 from rt=4 while taking rid=200 from rt=10
    val r = Seq(("k1", 4L, Some(100L), Some(1.5)),
        ("k1", 10L, Some(200L), Option.empty[Double]))
      .toDF("key", "rt", "rid", "rv")
    val l = Seq(("k1", 12L, "x")).toDF("key", "t", "lname")
    val out = AsofJoin.backward(l, r, Seq("key"), "t", "rt",
        payload = Seq("rid", "rv"))
      .select("rid", "rv").as[(Option[Long], Option[Double])].collect()
    assert(out.toSeq == Seq((Some(200L), None)))
  }

  test("duplicate right timestamps resolve by the declared tiebreak") {
    val r = Seq(("k1", 10L, 1L, 111.0), ("k1", 10L, 2L, 222.0))
      .toDF("key", "rt", "rid", "rv")
    val l = Seq(("k1", 10L, "x"), ("k1", 99L, "y")).toDF("key", "t", "lname")
    val out = AsofJoin.backward(l, r, Seq("key"), "t", "rt",
        payload = Seq("rv"), rightTiebreak = Some("rid"))
      .select("lname", "rv").as[(String, Double)].collect().sortBy(_._1)
    // largest tiebreak (rid=2) wins at the shared timestamp
    assert(out.toSeq == Seq(("x", 222.0), ("y", 222.0)))
  }

  test("left columns and row count are preserved exactly") {
    val out = AsofJoin.backward(left, right, Seq("key"), "t", "rt",
      payload = Seq("rid"))
    assert(out.columns.toSeq == Seq("key", "t", "lname", "rid"))
    assert(out.count() == left.count())
  }

  test("null right-side timestamps match nothing instead of fabricating " +
      "a nulls-first match for every row") {
    val r = Seq(("k1", Option.empty[Long], 999L, 9.9),
        ("k1", Some(4L), 100L, 1.5))
      .toDF("key", "rt", "rid", "rv")
    val l = Seq(("k1", 2L, "before"), ("k1", 5L, "after"))
      .toDF("key", "t", "lname")
    val out = AsofJoin.backward(l, r, Seq("key"), "t", "rt",
        payload = Seq("rid"))
      .select("lname", "rid").as[(String, Option[Long])]
      .collect().sortBy(_._1)
    // t=2 has NO right row at-or-before it (the null-rt row must not
    // win); t=5 matches the rt=4 row
    assert(out.toSeq == Seq(("after", Some(100L)), ("before", None)))
  }

  test("payload name collision with a left column fails fast") {
    val bad = right.withColumnRenamed("rid", "lname")
    intercept[IllegalArgumentException] {
      AsofJoin.backward(left, bad, Seq("key"), "t", "rt",
        payload = Seq("lname"))
    }
  }
}
