package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Quantifies the PQ path's RECALL against the exact-L2 oracle.
  * `sim_pq_adc` verifies the MECHANISM (codebook argmin encoding, ADC
  * table-lookup ranking) against DuckDB; this spec pins the QUALITY
  * claims the way PQ is actually deployed — ADC builds a shortlist,
  * exact distances re-rank it — with measured numbers, not hope.
  * Gaussian clusters at the production geometry (64-dim, 8 subspaces,
  * 16 codes); ids are SHUFFLED across clusters so the smallest-id init
  * sees the data's diversity (a cluster-ordered id assignment would
  * hand the init all one cluster — a caller-side sampling concern, not
  * an operator property). Seeded, deterministic.
  *
  * Measured here (seed 11): direct ADC recall@5 = 0.150 — coarse
  * 16-entry codebooks cannot rank INSIDE a tight cluster, which is
  * exactly why production PQ re-ranks; shortlist-40 recall of the true
  * top-5 = 1.000, and re-ranked top-5 therefore matches the exact
  * top-5 outright. The asserted floors sit under the measured values.
  */
class PqRecallSpec extends SparkSpec {
  import spark.implicits._

  test("ADC shortlist-40 captures the true top-5; re-ranking restores it") {
    val dim = 64
    val nCenters = 10
    val perCluster = 40
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(nCenters)(
      Array.fill(dim)(rnd.nextGaussian() * 3.0))
    val raw = (0 until nCenters).flatMap { c =>
      (0 until perCluster).map { _ =>
        centers(c).map(_ + rnd.nextGaussian() * 0.8).toSeq
      }
    }
    val points = rnd.shuffle(raw).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val vecs = points.toDF("vec_id", "v")
    val queries = vecs.where(col("vec_id") % 25 === 0)

    // exact-L2 oracle top-5
    def sqd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, t) => acc + t)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d"), col("cand_id"))
    val brute = vecs
      .crossJoin(queries.select(col("vec_id").as("query_id"),
        col("v").as("qv")))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        sqd(col("qv"), col("v")).as("d"))
      .withColumn("rnk", row_number().over(w)).where(col("rnk") <= 5)
      .select(col("query_id"), col("cand_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val (cb, _) = Pq.train(vecs, "vec_id", "v", 8, dim, 16, 2)
    val codes = Pq.encode(vecs, "vec_id", "v", cb, 8, dim)

    val adc5 = Pq.searchAdc(queries, "vec_id", "v", codes, cb, 8, dim, 5)
      .select(col("query_id"), col("cand_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val short40 = Pq.searchAdc(queries, "vec_id", "v", codes, cb, 8, dim, 40)
      .select(col("query_id"), col("cand_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rerank5 = Pq.searchRerank(queries, "vec_id", "v",
        vecs, "vec_id", "v", codes, cb, 8, dim, shortlist = 40, topK = 5)
      .select(col("query_id"), col("cand_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val adcRecall = (brute & adc5).size.toDouble / brute.size
    val shortRecall = (brute & short40).size.toDouble / brute.size
    val rerankRecall = (brute & rerank5).size.toDouble / brute.size
    info(f"ADC recall@5 = $adcRecall%.3f, shortlist-40 recall of top-5 = " +
      f"$shortRecall%.3f, re-ranked recall@5 = $rerankRecall%.3f")
    // floors sit under the measured values (0.150 / 1.000 / 1.000)
    assert(shortRecall >= 0.9,
      f"shortlist recall $shortRecall%.3f below the 0.9 floor")
    assert(rerankRecall >= 0.9,
      f"re-ranked recall $rerankRecall%.3f below the 0.9 floor")
    assert(rerankRecall >= shortRecall - 1e-9,
      "re-ranking can only lose what the shortlist already lost")
  }
}
