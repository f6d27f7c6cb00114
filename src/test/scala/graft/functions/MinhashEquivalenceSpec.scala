package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Dedup

/** The row-local MinhashSig expression must equal the relational
  * (explode → window → groupBy) form ARRAY-EXACTLY — the two compose
  * the same catalyst XXH64 primitives, and every dedup oracle depends
  * on that equality. Edges: unicode case folding, multi-whitespace,
  * leading/trailing space, sub-shingle docs, empty text, duplicates. */
class MinhashEquivalenceSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    1L -> ("the quick brown fox jumps over the lazy dog and then " +
      "jumps again over the very same lazy dog once more"),
    2L -> "İstanbul ÄÖÜ Straße ΣΙΓΜΑ мОсКвА 東京 tokyo TOKYO tokyo",
    3L -> "a  b\tc\nd   e f g h",     // runs of mixed whitespace
    4L -> " leading and trailing spaces ",
    5L -> "exactly three words",       // exactly one shingle at n=3
    6L -> "two words",                 // sub-shingle -> absent/null
    7L -> "",                          // empty -> absent/null
    8L -> ("repeat repeat repeat repeat repeat repeat repeat " +
      "repeat repeat repeat"))         // heavy duplicate shingles

  private def byId(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "sig").as[(Long, Seq[Long])].collect().toMap

  test("expression form == relational form, array-exact, all edges") {
    for (n <- Seq(2, 3); k <- Seq(8, 32)) {
      val d = docs.toDF("doc_id", "text")
      val fast = byId(Dedup.minhashSignatures(d, "doc_id", "text", n, k))
      val slow = byId(
        Dedup.minhashSignaturesRelational(d, "doc_id", "text", n, k))
      assert(fast.keySet == slow.keySet,
        s"doc sets diverge at n=$n k=$k: ${fast.keySet} vs ${slow.keySet}")
      fast.keys.foreach { id =>
        assert(fast(id) == slow(id), s"signature diverges for doc $id " +
          s"at n=$n k=$k")
      }
    }
  }

  test("equivalence holds on the synthetic corpus sample") {
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val fast = byId(Dedup.minhashSignatures(d, "doc_id", "text"))
    val slow = byId(Dedup.minhashSignaturesRelational(d, "doc_id", "text"))
    assert(fast == slow && fast.nonEmpty)
  }

  test("sub-shingle docs are absent from both forms") {
    val d = docs.toDF("doc_id", "text")
    val fast = byId(Dedup.minhashSignatures(d, "doc_id", "text", 3, 8))
    assert(!fast.contains(6L) && !fast.contains(7L))
  }
}
