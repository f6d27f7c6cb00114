package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Dedup

/** The row-local SimHash and winnowing expressions must equal their
  * relational (explode + aggregate/window) forms exactly — same edge
  * battery as the MinHash equivalence spec. */
class ShingleExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    1L -> ("the quick brown fox jumps over the lazy dog and then " +
      "jumps again over the very same lazy dog once more"),
    2L -> "İstanbul ÄÖÜ Straße ΣΙΓΜΑ мОсКвА 東京 tokyo TOKYO tokyo",
    3L -> "a  b\tc\nd   e f g h",
    4L -> " leading and trailing spaces ",
    5L -> "exactly three words",
    6L -> "two words",
    7L -> "",
    8L -> ("repeat repeat repeat repeat repeat repeat repeat " +
      "repeat repeat repeat"))

  test("SimhashSig == relational SimHashAgg form, all edges + corpus") {
    for (d <- Seq(docs.toDF("doc_id", "text"),
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))) {
      val fast = Dedup.simhashSignatures(d, "doc_id", "text")
        .as[(Long, Long)].collect().toMap
      val slow = Dedup.simhashSignaturesRelational(d, "doc_id", "text")
        .as[(Long, Long)].collect().toMap
      assert(fast == slow && fast.nonEmpty)
    }
  }

  test("WinnowSig fingerprint sets == relational winnow, all edges + " +
      "corpus") {
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.as[(Long, Long)].collect().toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (d <- Seq(docs.toDF("doc_id", "text"),
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))) {
      val fast = sets(Dedup.winnowFingerprints(d, "doc_id", "text"))
      val slow = sets(
        Dedup.winnowFingerprintsRelational(d, "doc_id", "text"))
      assert(fast == slow && fast.nonEmpty)
    }
  }

  test("DistinctShingleHashes == relational shingleRows+xxhash64 sets") {
    import org.apache.spark.sql.graftshim.Internals.{column => toCol, expression => toExpr}
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.as[(Long, Long)].collect().toSeq
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (d <- Seq(docs.toDF("doc_id", "text"),
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))) {
      val fast = sets(d.select(col("doc_id").as("id"), explode(toCol(
        graft.functions.DistinctShingleHashes(toExpr(col("text")), 3)))
        .as("h")))
      val slow = sets(Dedup.shingleRows(d, "doc_id", "text", 3)
        .select(col("id"), xxhash64(col("shingle")).as("h")).distinct())
      assert(fast == slow && fast.nonEmpty)
    }
  }

  test("PositionalShingleHashes == relational shingleRowsPos+xxhash64, " +
    "position for position") {
    import org.apache.spark.sql.graftshim.Internals.{column => toCol, expression => toExpr}
    def posMap(df: org.apache.spark.sql.DataFrame): Map[(Long, Int), Long] =
      df.as[(Long, Int, Long)].collect()
        .map { case (id, p, h) => (id, p) -> h }.toMap
    for (d <- Seq(docs.toDF("doc_id", "text"),
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))) {
      val fast = posMap(d.select(col("doc_id").as("id"), posexplode(toCol(
        graft.functions.PositionalShingleHashes(toExpr(col("text")), 3)))
        .as(Seq("start", "h"))))
      val slow = posMap(Dedup.shingleRowsPos(d, "doc_id", "text", 3)
        .select(col("id"), (col("pos") - lit(2)).cast("int").as("start"),
          xxhash64(col("shingle")).as("h")))
      assert(fast == slow && fast.nonEmpty)
    }
  }

  test("sub-shingle and no-full-window docs are absent from both forms") {
    val d = docs.toDF("doc_id", "text")
    val sim = Dedup.simhashSignatures(d, "doc_id", "text")
      .select("id").as[Long].collect().toSet
    assert(!sim.contains(6L) && !sim.contains(7L))
    // doc 5 has exactly ONE shingle at n=3: no full window of 4
    val win = Dedup.winnowFingerprints(d, "doc_id", "text")
      .select("id").as[Long].collect().toSet
    assert(!win.contains(5L) && !win.contains(6L) && !win.contains(7L))
  }
}
