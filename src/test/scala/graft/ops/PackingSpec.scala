package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariants of the sequence-packing layout (Packing.packSpans):
  * spans cover each document exactly once, every non-final sequence of a
  * shard is exactly full, and the layout is a pure function of
  * (shard, order) — partitioning-invariant. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 16

  // (shard, order=id, tokens) — includes a doc longer than the budget
  // (id 3: 40 tokens straddles 3+ sequences) and exact-fit boundaries.
  private val docs = Seq(
    ("a", 1L, 10L), ("a", 2L, 6L), ("a", 3L, 40L), ("a", 4L, 1L),
    ("b", 10L, 16L), ("b", 11L, 5L)
  ).toDF("lang", "doc_id", "tok")

  private def spans = Packing.packSpans(docs, col("lang"), col("doc_id"),
    col("doc_id"), col("tok"), budget)

  test("spans cover each document exactly once, in order") {
    val perDoc = spans.groupBy("doc_id")
      .agg(sum("span_len").as("covered"), min("doc_offset").as("first_off"),
        max(col("doc_offset") + col("span_len")).as("last_end"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val toks = docs.collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    toks.foreach { case (id, tok) =>
      val (covered, firstOff, lastEnd) = perDoc(id)
      assert(covered == tok, s"doc $id covered $covered of $tok")
      assert(firstOff == 0L && lastEnd == tok)
    }
    // contiguity: consecutive spans of one doc chain doc_offset
    val rows = spans.orderBy("doc_id", "doc_offset")
      .select("doc_id", "doc_offset", "span_len").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      rs.sortBy(_.getLong(1)).foldLeft(0L) { (expect, r) =>
        assert(r.getLong(1) == expect); expect + r.getLong(2)
      }
    }
  }

  test("every non-final sequence of a shard is exactly full") {
    val stats = Packing.seqStats(spans, budget).collect()
    val lastSeq = stats.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).max).toMap
    stats.foreach { r =>
      val (shard, seq, filled) = (r.getString(0), r.getLong(1),
        r.getLong(4))
      if (seq < lastSeq(shard)) assert(filled == budget,
        s"sequence $shard/$seq filled $filled of $budget")
      else assert(filled <= budget)
    }
    // shard totals: sequences jointly hold every token of the shard
    val shardTok = docs.groupBy("lang").agg(sum("tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    stats.groupBy(_.getString(0)).foreach { case (shard, rs) =>
      assert(rs.map(_.getLong(4)).sum == shardTok(shard))
    }
  }

  test("a long document straddles contiguous sequences") {
    val doc3 = spans.where(col("doc_id") === 3)
      .orderBy("seq_id").collect()
    assert(doc3.length >= 3) // 40 tokens / 16 budget
    val seqs = doc3.map(_.getLong(1))
    assert(seqs.zip(seqs.tail).forall { case (a, b) => b == a + 1 })
    // interior spans of a straddling doc are full-sequence spans
    doc3.tail.dropRight(1).foreach(r => assert(r.getLong(5) == budget))
  }

  test("layout is partitioning-invariant") {
    val base = spans.orderBy("shard", "seq_id", "seq_offset").collect()
    val shuffled = Packing.packSpans(docs.repartition(7, col("tok")),
        col("lang"), col("doc_id"), col("doc_id"), col("tok"), budget)
      .orderBy("shard", "seq_id", "seq_offset").collect()
    assert(base.sameElements(shuffled))
  }

  test("non-positive token count fails loudly, naming the doc") {
    val bad = Seq(("a", 1L, 5L), ("a", 2L, 0L)).toDF("lang", "doc_id", "tok")
    val e = intercept[Exception] {
      Packing.packSpans(bad, col("lang"), col("doc_id"), col("doc_id"),
        col("tok"), budget).collect()
    }
    assert(e.getMessage != null)
  }

  test("a duplicated (shard, order) pair fails loudly — the layout is " +
      "undefined under order ties") {
    // two docs share order=1 in shard "a": the cumsum's ROWS frame has
    // no defined result, so the contract is a loud failure, not a
    // partitioning-dependent layout
    val tied = Seq(("a", 1L, 10L, 5L), ("a", 1L, 11L, 3L),
      ("b", 1L, 12L, 4L)).toDF("lang", "ord", "doc_id", "tok")
    val e = intercept[Exception] {
      Packing.packSpans(tied, col("lang"), col("ord"), col("doc_id"),
        col("tok"), budget).collect()
    }
    assert(e.getMessage != null)
    // the same orders in DIFFERENT shards are fine
    val ok = Seq(("a", 1L, 10L, 5L), ("b", 1L, 11L, 3L))
      .toDF("lang", "ord", "doc_id", "tok")
    assert(Packing.packSpans(ok, col("lang"), col("ord"), col("doc_id"),
      col("tok"), budget).count() == 2)
  }
}
