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

  test("multi-probe IVF-PQ: probing the runner-up cell recovers " +
      "boundary neighbours single-probe loses; p=1 == the single-cell " +
      "path exactly") {
    val dim = 64
    // two OVERLAPPING clusters (centers 1.5 sigma apart in one axis):
    // many points sit near the boundary, so their true neighbours
    // straddle cells — the case multi-probe exists for
    val rnd = new scala.util.Random(7)
    val c0 = Array.fill(dim)(0.0)
    val c1 = c0.clone(); c1(0) = 3.0
    val raw = Seq(c0, c1).zipWithIndex.flatMap { case (c, cell) =>
      (0 until 60).map(_ => (cell, c.map(_ + rnd.nextGaussian() * 2.0).toSeq))
    }
    val points = rnd.shuffle(raw).zipWithIndex
      .map { case ((cell, v), i) => (i.toLong, cell, v) }
    val vecs = points.toDF("vec_id", "cell", "v")
    val queries = vecs.where(col("vec_id") % 11 === 0)

    val (cb, _) = Pq.train(vecs, "vec_id", "v", 8, dim, 16, 2)
    val codes = Pq.encode(vecs, "vec_id", "v", cb, 8, dim)
      .join(vecs.select(col("vec_id").as("id"), col("cell")), "id")
    val cents = vecs
      .select(col("cell"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("cell"), col("i"))
      .agg((sum(col("x").cast("decimal(18,9)")).cast("double") /
        count(lit(1))).as("c"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
        s => s.getField("c")).as("cv"))

    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("cand_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // p=1 through the probed path == the single-cell delegation exactly
    val single = pairs(Pq.searchAdcInCells(queries, "vec_id", "v", "cell",
      codes, "cell", cb, 8, dim, topK = 5))
    val p1 = pairs(Pq.searchAdcInProbedCells(queries, "vec_id", "v",
      Pq.probeCells(queries, "vec_id", "v", cents, "cell", probes = 1),
      codes, "cell", cb, 8, dim, topK = 5))
    // note: a query's OWN cell need not be its nearest centroid for
    // boundary points, so compare p=1 against the nearest-centroid
    // restriction of itself, not against `single` — what IS exact is
    // the delegation identity below
    val delegated = pairs(Pq.searchAdcInProbedCells(queries, "vec_id", "v",
      queries.select(col("vec_id").as("id"), col("cell")),
      codes, "cell", cb, 8, dim, topK = 5))
    assert(delegated == single,
      "searchAdcInCells must equal the probed path given the same cells")

    // probing 2 cells strictly widens the candidate set: the ADC top-5
    // under p=2 ranks over a superset, and on this boundary-heavy
    // geometry it must recover exact-L2 top-5 neighbours that p=1
    // leaves in the other cell
    val p2 = pairs(Pq.searchAdcInProbedCells(queries, "vec_id", "v",
      Pq.probeCells(queries, "vec_id", "v", cents, "cell", probes = 2),
      codes, "cell", cb, 8, dim, topK = 5))
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
    val r1 = (brute & p1).size.toDouble / brute.size
    val r2 = (brute & p2).size.toDouble / brute.size
    info(f"recall@5 single-probe $r1%.3f, multi-probe(2) $r2%.3f")
    assert(r2 >= r1,
      f"multi-probe recall $r2%.3f fell below single-probe $r1%.3f")
    assert(r2 > r1 + 0.02,
      "on a boundary-heavy geometry probing the runner-up cell must " +
        f"measurably improve recall (got $r1%.3f -> $r2%.3f)")
  }
}
