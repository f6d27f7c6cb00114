package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Semantics of C4-style segment-level dedup (Dedup.segmentDedup):
  * global keep-first on exact segments, within-doc repeats included,
  * order-preserving reassembly, partitioning invariance. */
class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  // segments pre-split (the operator takes the caller's segmenter output)
  private val docs = Seq(
    (1L, Seq("alpha", "boiler plate", "beta")),
    (2L, Seq("boiler plate", "gamma", "boiler plate")), // cross- AND within-doc
    (3L, Seq("delta", "delta")),                        // within-doc only
    (4L, Seq("boiler plate"))                           // fully removed
  ).toDF("doc_id", "segs")

  private def result = Dedup.segmentDedup(docs, "doc_id", col("segs"))

  private def byId = result.collect()
    .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
    .toMap

  test("global first occurrence survives; later repeats are removed") {
    assert(byId(1L) == ("alpha boiler plate beta", 3L, 0L))
    assert(byId(2L) == ("gamma", 3L, 2L))
    assert(byId(4L) == ("", 1L, 1L))
  }

  test("within-doc repeats keep only the first occurrence") {
    assert(byId(3L) == ("delta", 2L, 1L))
  }

  test("reassembly preserves original segment order") {
    val d = Seq((1L, Seq("z end", "m mid", "a start")))
      .toDF("doc_id", "segs")
    val r = Dedup.segmentDedup(d, "doc_id", col("segs")).collect()(0)
    assert(r.getString(1) == "z end m mid a start")
  }

  test("keep-first is deterministic under repartitioning") {
    val base = result.orderBy("id").collect()
    val shuffled = Dedup.segmentDedup(
        docs.repartition(5, col("doc_id")), "doc_id", col("segs"))
      .orderBy("id").collect()
    assert(base.sameElements(shuffled))
  }

  test("custom separator threads through") {
    val r = Dedup.segmentDedup(docs, "doc_id", col("segs"), sep = "\n\n")
      .where(col("id") === 1).collect()(0)
    assert(r.getString(1) == "alpha\n\nboiler plate\n\nbeta")
  }
}
