package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gap-based sessionization semantics: boundary at exactly `gapNs` stays
  * in-session, strictly greater splits; 1-based numbering per key;
  * tiebreak determinism; rollup bounds/sums. */
class SessionsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // user 1: gaps 5, 10 (== gap, stays), 11 (> gap, splits), 1
    ("u1", 100L, 1L, 1.0),
    ("u1", 105L, 2L, 2.0),
    ("u1", 115L, 3L, 3.0),
    ("u1", 126L, 4L, 4.0),
    ("u1", 127L, 5L, 5.0),
    // user 2: a single event
    ("u2", 500L, 6L, 6.0),
    // user 3: every event its own session
    ("u3", 0L, 7L, 7.0),
    ("u3", 100L, 8L, 8.0),
    ("u3", 200L, 9L, 9.0))

  private def df = rows.toDF("user", "t", "id", "v")

  test("session boundaries: > gap splits, == gap does not") {
    val out = Sessions.sessionize(df, Seq("user"), col("t"), gapNs = 10L,
        tiebreak = Seq(col("id")))
      .select("user", "id", "session_idx").as[(String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      ("u1", 1L, 1L), ("u1", 2L, 1L), ("u1", 3L, 1L),
      ("u1", 4L, 2L), ("u1", 5L, 2L),
      ("u2", 6L, 1L),
      ("u3", 7L, 1L), ("u3", 8L, 2L), ("u3", 9L, 3L)))
  }

  test("sessionStats rollup: bounds, duration, count, exact sum") {
    val out = Sessions.sessionStats(df, Seq("user"), col("t"), gapNs = 10L,
        valueCol = col("v"), tiebreak = Seq(col("id")))
      .orderBy("user", "session_idx")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq(
      ("u1", 1L, 3L, 100L, 115L, 15L, 6.0),
      ("u1", 2L, 2L, 126L, 127L, 1L, 9.0),
      ("u2", 1L, 1L, 500L, 500L, 0L, 6.0),
      ("u3", 1L, 1L, 0L, 0L, 0L, 7.0),
      ("u3", 2L, 1L, 100L, 100L, 0L, 8.0),
      ("u3", 3L, 1L, 200L, 200L, 0L, 9.0)))
  }

  test("equal timestamps order by the tiebreak, not arrival order") {
    // two rows at t=100 for one key; with gap 0 every distinct t splits,
    // but the equal-t pair must land in ONE session in id order
    val d = Seq(("k", 100L, 2L), ("k", 100L, 1L), ("k", 101L, 3L))
      .toDF("user", "t", "id")
    val out = Sessions.sessionize(d, Seq("user"), col("t"), gapNs = 0L,
        tiebreak = Seq(col("id")))
      .select("id", "session_idx").as[(Long, Long)]
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 2L)))
  }
}
