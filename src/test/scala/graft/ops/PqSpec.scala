package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Product quantization: per-subspace equivalence with KMeans.fit,
  * encode/train agreement, the ADC identity (adist = sum of per-subspace
  * quantized distances), neighbour sanity on separated clusters, and
  * partitioning invariance. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val subspaces = 2
  private val k = 3
  private val iters = 2

  /** 24 deterministic vectors in 3 well-separated blobs (blob b centred
    * at 10·b per dimension, jitter < 1). */
  private def vecs = (0 until 24).map { i =>
    val blob = i % 3
    (i.toLong, (0 until dim).map(d =>
      10.0 * blob + math.sin(i * 31 + d * 7) * 0.9).toArray)
  }.toDF("vec_id", "v")

  private lazy val (codebook, assigned) =
    Pq.train(vecs, "vec_id", "v", subspaces, dim, k, iters)

  test("per-subspace training equals KMeans.fit on the sliced vectors") {
    val sd = dim / subspaces
    // code -> init-vector id: rank of id among the k smallest ids
    val codeToCid = (0L until k.toLong).zipWithIndex
      .map { case (cid, code) => code -> cid }.toMap
    (0 until subspaces).foreach { s =>
      val sliced = vecs.select(col("vec_id"),
        slice(col("v"), s * sd + 1, sd).as("v"))
      val want = KMeans.fit(sliced, "vec_id", k, iters)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
      val got = assigned.where(col("sub") === s)
        .collect().map(r => r.getLong(0) ->
          (codeToCid(r.getInt(2)), r.getDouble(3))).toMap
      assert(got == want, s"subspace $s diverges from KMeans.fit")
    }
  }

  test("encode reproduces the training assignment") {
    val enc = Pq.encode(vecs, "vec_id", "v", codebook, subspaces, dim)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val fromTrain = assigned.groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("sub"), col("code")))),
        x => x.getField("code")).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc == fromTrain)
  }

  test("ADC distance is the sum of per-subspace quantized distances") {
    val codes = Pq.encode(vecs, "vec_id", "v", codebook, subspaces, dim)
    val q = vecs.where(col("vec_id") < 2)
    val got = Pq.searchAdc(q, "vec_id", "v", codes, codebook,
        subspaces, dim, topK = 23)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    // recompute independently on the driver, mirroring the decimal rules
    val cb = codebook.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
    val cd = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val vv = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def dec(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(9, java.math.RoundingMode.HALF_UP)
    def sqDist(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => dec((x - y) * (x - y)) }
        .reduce(_ add _).doubleValue()
    val sd = dim / subspaces
    got.foreach { case ((qid, cid), adist) =>
      val expect = (0 until subspaces).map { s =>
        val qs = vv(qid).slice(s * sd, (s + 1) * sd)
        dec(sqDist(qs, cb((s, cd(cid)(s)))))
      }.reduce(_ add _).doubleValue()
      val rounded = java.math.BigDecimal.valueOf(expect)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(adist == rounded, s"($qid,$cid): $adist != $rounded")
    }
  }

  test("on separated blobs every top-7 ADC neighbour is a blob-mate") {
    val codes = Pq.encode(vecs, "vec_id", "v", codebook, subspaces, dim)
    val q = vecs.where(col("vec_id") < 3)
    val top = Pq.searchAdc(q, "vec_id", "v", codes, codebook,
      subspaces, dim, topK = 7).collect()
    top.foreach { r =>
      assert(r.getLong(0) % 3 == r.getLong(2) % 3,
        s"query ${r.getLong(0)} ranked non-blob-mate ${r.getLong(2)}")
    }
  }

  test("IVF-PQ restricts candidates to the query's cell, same ADC order") {
    val cells = vecs.select(col("vec_id").as("id"),
      (col("vec_id") % 3).cast("int").as("cell"))
    val codes = Pq.encode(vecs, "vec_id", "v", codebook, subspaces, dim)
      .join(cells, "id")
    val q = vecs.where(col("vec_id") < 3)
      .withColumn("cell", (col("vec_id") % 3).cast("int"))
    val got = Pq.searchAdcInCells(q, "vec_id", "v", "cell", codes, "cell",
      codebook, subspaces, dim, topK = 23).collect()
    // every candidate shares the query's cell
    got.foreach(r => assert(r.getLong(0) % 3 == r.getLong(2) % 3))
    // within the cell, ranking equals plain ADC filtered to the cell
    val full = Pq.searchAdc(q, "vec_id", "v", codes, codebook,
        subspaces, dim, topK = 23).collect()
      .filter(r => r.getLong(0) % 3 == r.getLong(2) % 3)
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(r =>
        (r.getLong(2), r.getDouble(3))).toSeq).toMap
    got.groupBy(_.getLong(0)).foreach { case (qid, rs) =>
      val mine = rs.sortBy(_.getInt(1)).map(r =>
        (r.getLong(2), r.getDouble(3))).toSeq
      assert(mine == full(qid), s"query $qid cell ranking diverges")
    }
  }

  test("codebook and encoding are partitioning-invariant") {
    val (cb2, _) = Pq.train(vecs.repartition(7, col("vec_id")),
      "vec_id", "v", subspaces, dim, k, iters)
    val a = codebook.orderBy("sub", "code")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    val b = cb2.orderBy("sub", "code")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
    assert(a.sameElements(b))
  }
}
