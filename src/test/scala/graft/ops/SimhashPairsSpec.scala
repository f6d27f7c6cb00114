package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hamming-banded near-dup pairing: pigeonhole completeness at
  * maxDist <= 3 against a brute-force oracle, the below-the-exchange
  * far-pair filter, the end-to-end SimHash text path (including the
  * feature-granularity contrast the corpus query keys on), and the
  * n = 1 shingle base the unigram form needs. */
class SimhashPairsSpec extends SparkSpec {
  import spark.implicits._

  private def brute(hashes: Seq[(Long, Long)], maxDist: Int) =
    (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= maxDist
    } yield (ia, ib, d)).sorted

  test("banded pairs == brute force at maxDist = 3 (pigeonhole-complete)") {
    // 120 random 64-bit hashes + planted near-dups at 0..3 flipped bits
    // (flips concentrated AND spread across bands) + a dist-4 pair
    val rnd = new scala.util.Random(20260814)
    val base = (0 until 120).map(i => (i.toLong, rnd.nextLong()))
    val planted = Seq(
      (200L, base(3)._2),                    // dist 0
      (201L, base(5)._2 ^ 1L),               // dist 1, band 0
      (202L, base(7)._2 ^ (1L << 63)),       // dist 1, sign bit band 3
      (203L, base(9)._2 ^ 3L),               // dist 2 same band
      (204L, base(11)._2 ^ (1L | (1L << 20) | (1L << 40))), // dist 3 spread
      (205L, base(13)._2 ^ ((1L << 1) | (1L << 17) | (1L << 33) | (1L << 49))) // dist 4
    )
    val all = base ++ planted
    val got = Dedup.hammingBandedPairs(all.toDF("id", "h"), "id", "h", 3)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)]
      .collect().toSeq.sorted
    assert(got == brute(all, 3))
    assert(got.exists { case (_, b, d) => b == 204L && d == 3 },
      "a 3-bit pair spread over three bands must still share the 4th")
    assert(!got.exists(_._2 == 205L),
      "the dist-4 pair is outside the contract cut")
  }

  test("far pairs sharing a band die below the pair exchange") {
    // two hashes IDENTICAL in band 0 but differing in 30+ high bits:
    // the band join emits the pair, the Hamming filter must kill it
    val h1 = 0x0000000000001234L
    val h2 = 0x7FFFFFFF00001234L
    assert(java.lang.Long.bitCount(h1 ^ h2) > 3)
    val got = Dedup.hammingBandedPairs(
      Seq((1L, h1), (2L, h2)).toDF("id", "h"), "id", "h", 3).count()
    assert(got == 0)
  }

  test("simhash pairs: word-order shuffle pairs at n=1, not at n=3") {
    // the corpus class the oracle query targets: identical word BAGS,
    // different order — unigram simhash distance 0, trigram shingle
    // sets disjoint (distance large)
    val a = "spark shuffles the partition keys across every executor node"
    val b = "every node executor across keys the partition shuffles spark"
    val docs = Seq((1L, a), (2L, b), (3L, "completely unrelated text " +
      "about something else entirely with different words")).toDF("id", "t")
    val uni = Dedup.simhashNearDupPairs(docs, "id", "t", n = 1, maxDist = 3)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect().toSeq
    assert(uni == Seq((1L, 2L, 0)))
    val tri = Dedup.simhashNearDupPairs(docs, "id", "t", n = 3, maxDist = 3)
      .count()
    assert(tri == 0, "trigram features must NOT pair the shuffled docs")
  }

  test("shingleRowsPos n=1: one row per word, positions preserved") {
    val rows = Dedup.shingleRowsPos(Seq((1L, "Alpha beta GAMMA"))
        .toDF("id", "t"), "id", "t", n = 1)
      .select("id", "pos", "shingle").as[(Long, Int, String)]
      .collect().toSeq.sortBy(_._2)
    assert(rows == Seq((1L, 0, "alpha"), (1L, 1, "beta"), (1L, 2, "gamma")))
  }
}
