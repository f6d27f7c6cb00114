package graft.functions

import graft.SparkSpec

/** The SQL surface of the native expressions: registration, evaluation
  * parity with the Column API, literal-argument validation, and codegen
  * (the registered functions are the same Expression classes the
  * DataFrame path uses, so parity here proves one kernel serves both).
  */
class GraftExtensionsSpec extends SparkSpec {

  GraftExtensions.register(spark)

  private def one[T](sql: String): T =
    spark.sql(sql).collect()(0).get(0).asInstanceOf[T]

  test("graft_dot / graft_cosine evaluate from SQL") {
    assert(one[Double](
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))")
      == 32.0)
    assert(math.abs(one[Double](
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d))")
      - 1.0) < 1e-12)
    assert(math.abs(one[Double](
      "SELECT graft_cosine(array(1.0d, 0.0d), array(0.0d, 1.0d))"))
      < 1e-12)
  }

  test("graft_sig_agree counts equal signature positions") {
    assert(one[Int](
      "SELECT graft_sig_agree(array(1L, 2L, 3L), array(1L, 9L, 3L))") == 2)
  }

  test("graft_lsh_bucket equals the Column-API expression") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vecs = Seq.tabulate(20)(i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j).toDouble)))
      .toDF("id", "v")
    vecs.createOrReplaceTempView("lsh_vecs")
    val viaSql = spark.sql(
        "SELECT id, graft_lsh_bucket(v, 8, 6) AS b FROM lsh_vecs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = vecs.select(col("id"),
        graft.ops.VectorOps.lshBuckets(col("v"), dim = 8, nPlanes = 6)
          .as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol)
  }

  test("graft_c4_clean_lines equals the Column-API c4Flags text_clean") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      "A good first sentence here.\nshort\nPlease enable " +
        "JavaScript now.\nAnd a proper closing line!",
      "no punct line\nOnly surviving sentence stays here.",
      "").toDF("text")
    docs.createOrReplaceTempView("c4_docs")
    val viaSql = spark.sql(
      "SELECT graft_c4_clean_lines(text, 3) AS tc FROM c4_docs")
      .collect().map(_.getString(0)).toSeq
    val viaCol = docs.select(
      graft.ops.TextMetrics.c4Flags(col("text")).getField("text_clean"))
      .collect().map(_.getString(0)).toSeq
    assert(viaSql == viaCol)
    assert(viaSql(0) ==
      "A good first sentence here.\nAnd a proper closing line!")
  }

  test("graft_psl_domain equals the Column-API form on the full list") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // unstripped hosts (case, port, FQDN dot), every rule class incl.
    // punycode and unicode IDN — the builder wraps the SAME strips the
    // Column API applies, so the plans must be value-identical
    val hosts = Seq("MyBlog.Blogspot.COM:443", "a.b.example.co.uk.",
      "x.shop.anything.ck", "media.city.kawasaki.jp", "co.uk",
      "foo.xn--55qx5d.cn", "bar.公司.cn", "10.1.2.3:8080", "", "plain")
      .toDF("host")
    hosts.createOrReplaceTempView("psl_hosts")
    val viaSql = spark.sql(
      "SELECT graft_psl_domain(host) AS d FROM psl_hosts")
      .collect().map(r => Option(r.getString(0)))
    val viaCol = hosts.select(
        graft.ops.UrlOps.registrableDomainPsl(col("host")).as("d"))
      .collect().map(r => Option(r.getString(0)))
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql.contains(Option("foo.xn--55qx5d.cn"))) // twin resolved
  }

  test("r14 text/signature/JL functions: SQL ≡ the ops-layer Column " +
      "forms on real corpus text (registration + literal plumbing)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "aaa aaa aaa aaa aaa aaa aaa aaa",
      "short",
      "Précomposed vs précomposed text",  // NFC-divergent forms
      null.asInstanceOf[String])
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    docs.createOrReplaceTempView("ext_docs")
    val sqlOut = spark.sql(
      """SELECT id,
           graft_nfc(text) AS nfc,
           graft_deflate_ratio(text) AS dr,
           graft_minhash_sig(text, 3, 8) AS mh,
           graft_simhash(text, 3) AS sh,
           graft_winnow_sig(text, 3, 4) AS ws,
           graft_shingle_hashes(text, 3) AS dh,
           graft_shingle_hashes_pos(text, 3) AS ph,
           graft_repetition_sig(text, 2) AS rep
         FROM ext_docs""").collect().map(r => r.toSeq.map(v =>
      Option(v).map(_.toString))).toSeq
    import org.apache.spark.sql.graftshim.Internals.{column => c, expression => e}
    val colOut = docs.select(col("id"),
        c(NfcNormalize(e(col("text")))).as("nfc"),
        c(DeflateRatio(e(col("text")))).as("dr"),
        c(MinhashSig(e(col("text")), 3, 8)).as("mh"),
        c(SimhashSig(e(col("text")), 3)).as("sh"),
        c(WinnowSig(e(col("text")), 3, 4)).as("ws"),
        c(DistinctShingleHashes(e(col("text")), 3)).as("dh"),
        c(PositionalShingleHashes(e(col("text")), 3)).as("ph"),
        c(RepetitionSig(e(col("text")), 2)).as("rep"))
      .collect().map(r => r.toSeq.map(v =>
        Option(v).map(_.toString))).toSeq
    assert(sqlOut == colOut)
    // JL projection: 2 input rows, 16→4 dims, bit-identical
    val vecs = Seq.tabulate(2)(i =>
      (i.toLong, Array.tabulate(16)(j => math.cos(i * 16 + j))))
      .toDF("id", "v")
    vecs.createOrReplaceTempView("ext_vecs")
    val rpSql = spark.sql(
        "SELECT graft_rp_project(v, 16, 4) AS p FROM ext_vecs")
      .collect().map(_.getSeq[Double](0)).toSeq
    val rpCol = vecs.select(
        graft.ops.VectorOps.randomProject(col("v"), 16, 4).as("p"))
      .collect().map(_.getSeq[Double](0)).toSeq
    assert(rpSql == rpCol)
  }

  test("non-literal dim/planes fail fast with a clear message") {
    val ex = intercept[Exception](
      spark.sql("SELECT graft_lsh_bucket(array(1.0d), id, 4) " +
        "FROM range(1)").collect())
    assert(ex.getMessage.contains("INTEGER literal") ||
      Option(ex.getCause).exists(_.getMessage.contains("INTEGER literal")))
  }

  test("wrong input types are rejected by the expression type check") {
    val ex = intercept[Exception](
      spark.sql("SELECT graft_dot(array('a'), array('b'))").collect())
    assert(ex.getMessage.contains("array<double>") ||
      ex.getMessage.toLowerCase.contains("datatype_mismatch"))
  }
}
