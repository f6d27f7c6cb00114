package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  test("median and MAD match hand-computed values") {
    // group a: 1..9 -> med 5, |x-5| = 4,3,2,1,0,1,2,3,4 -> mad 2.
    // group b: 10,10,10,100 -> med 10, devs 0,0,0,90 -> mad interp 0.
    val df = ((1 to 9).map(("a", _)) ++ Seq(("b", 10), ("b", 10), ("b", 10),
      ("b", 100))).toDF("g", "v").select($"g", $"v".cast("double").as("v"))
    val mm = RobustStats.medianMad(df, Seq("g"), "v").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(mm("a") == ((5.0, 9L, 2.0)))
    assert(mm("b") == ((10.0, 4L, 0.0)))
  }

  test("outlierFlag flags only planted outliers, honors minCount guard") {
    // Big group: values near 100 plus one wild value -> flagged.
    // Tiny group (<10 rows): wild value NOT flagged (fmask.c:237 guard).
    val big = (1 to 99).map(i => ("big", 100.0 + (i % 7))) :+ (("big", 9999.0))
    val tiny = Seq(("tiny", 1.0), ("tiny", 2.0), ("tiny", 9999.0))
    val df = (big ++ tiny).toDF("g", "v")
    val out = RobustStats.outlierFlag(df, Seq("g"), "v", esdMul = 3.0)
      .where($"is_outlier").select($"g", $"v").collect()
    assert(out.toSeq.map(r => (r.getString(0), r.getDouble(1)))
      == Seq(("big", 9999.0)))
  }

  test("medianMadOnePass (custom Aggregator) equals the two-stage form") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 500).map(i => (s"g${i % 7}", rnd.nextDouble() * 1000))
      .toDF("g", "v")
    def toMap(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("med"), r.getAs[Long]("n"), r.getAs[Double]("mad")))
      .toMap
    val twoStage = toMap(RobustStats.medianMad(df, Seq("g"), "v"))
    val onePass = toMap(RobustStats.medianMadOnePass(df, Seq("g"), "v"))
    assert(twoStage == onePass)
  }

  test("medianMad is invariant to row order") {
    val base = (1 to 50).map(i => ("g", math.sin(i) * 100))
    val a = RobustStats.medianMad(base.toDF("g", "v"), Seq("g"), "v")
      .collect().head
    val b = RobustStats.medianMad(
      scala.util.Random.shuffle(base).toDF("g", "v"), Seq("g"), "v")
      .collect().head
    assert(a.getDouble(1) == b.getDouble(1) && a.getDouble(3) == b.getDouble(3))
  }
}

class HistogramSpec extends SparkSpec {
  import spark.implicits._

  test("binIndex clamps out-of-range to -1") {
    val df = Seq(-1.0, 0.0, 0.5, 9.99, 10.0, 42.0).toDF("x")
    val bins = df.select(Histogram.binIndex($"x", 0.0, 1.0, 10).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(bins == Seq(-1, 0, 0, 9, -1, -1))
  }

  test("integrate computes per-variant conditional means in one pass") {
    val df = Seq((0, 10.0, true), (0, 20.0, true), (0, 100.0, false),
      (1, 50.0, true)).toDF("b", "v", "keep")
    val out = Histogram.integrate(df, $"b", $"v",
      Seq("all" -> lit(true), "kept" -> $"keep"))
      .orderBy($"bin").collect()
    assert(out(0).getDouble(1) == (10.0 + 20.0 + 100.0) / 3) // i_all bin 0
    assert(out(0).getDouble(3) == 15.0)                      // i_kept bin 0
    assert(out(1).getDouble(3) == 50.0 && out(1).getLong(4) == 1L)
  }
}

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine: parallel=1, orthogonal=0, antiparallel=-1") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(2.0, 0.0)),
      (Seq(1.0, 0.0), Seq(0.0, 5.0)),
      (Seq(1.0, 1.0), Seq(-2.0, -2.0))).toDF("a", "b")
    val out = df.select(round(VectorOps.cosine($"a", $"b"), 9).as("c"))
      .collect().map(_.getDouble(0)).toSeq
    assert(out == Seq(1.0, 0.0, -1.0))
  }

  test("topKCosine ranks planted nearest neighbour first") {
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0)),
      (1L, Seq(0.9, 0.1, 0.0)),  // closest to 0
      (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(-1.0, 0.0, 0.0))).toDF("id", "v")
    val top = VectorOps.topKCosine(vecs.where($"id" === 0), vecs, "id", "v", 2)
      .collect()
    assert(top(0).getLong(2) == 1L) // rank 1 = planted neighbour
    assert(top(1).getLong(2) == 2L)
  }

  test("lagCosine: first row compares to itself (csim=1)") {
    val df = Seq((0, Seq(1.0, 2.0)), (1, Seq(1.0, 2.0)), (2, Seq(-2.0, 1.0)))
      .toDF("i", "v").withColumn("g", lit("d"))
    val out = VectorOps.lagCosine(df, "v", Seq("g"), "i")
      .orderBy($"i").select(round($"csim_prev", 9)).collect()
      .map(_.getDouble(0)).toSeq
    assert(out == Seq(1.0, 1.0, 0.0))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exactGroups finds duplicate content") {
    val df = Seq((1L, "hello world"), (2L, "hello world"), (3L, "unique"))
      .toDF("id", "text")
    val dups = Dedup.exactGroups(df, "id", "text")
      .where($"n_copies" > 1).collect()
    assert(dups.length == 1 && dups(0).getLong(1) == 2L
      && dups(0).getLong(2) == 1L)
  }

  test("shingles builds distinct word trigrams") {
    val sh = Seq("a b c d b c d").toDF("t")
      .select(Dedup.shingles($"t", 3).as("s")).collect()(0)
      .getSeq[String](0)
    assert(sh.toSet == Set("a b c", "b c d", "c d b", "d b c"))
  }

  test("jaccard: identical=1, disjoint=0") {
    val df = Seq(("a b c d e f", "a b c d e f", "q r s t u v"))
      .toDF("x", "y", "z")
    val r = df.select(
      Dedup.jaccard(Dedup.shingles($"x"), Dedup.shingles($"y")).as("same"),
      Dedup.jaccard(Dedup.shingles($"x"), Dedup.shingles($"z")).as("diff"))
      .collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("minhashCandidates surfaces planted near-duplicates") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w7", "x7") // ~93% shingle overlap
    val others = (1 to 20).map(i =>
      (100L + i, (1 to 40).map(j => s"o${i}_$j").mkString(" ")))
    val df = (Seq((1L, base), (2L, nearDup)) ++ others).toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(df, "doc_id", "text",
      n = 3, k = 32, bands = 8)
      .where($"id_a" === 1 && $"id_b" === 2).collect()
    assert(cands.length == 1 && cands(0).getDouble(2) > 0.5)
  }

  test("simhashSignatures (explode form) equals per-row simhash") {
    val docs = Seq((1L, "a b c d e f g h"), (2L, "x y z w q r s t u"))
      .toDF("doc_id", "text")
    val viaAgg = Dedup.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = docs.select($"doc_id",
      Dedup.simhash(Dedup.shingles($"text", 3)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg == viaExpr, s"agg=$viaAgg expr=$viaExpr")
  }

  test("simhash: near-identical docs have small Hamming distance") {
    val a = (1 to 60).map(i => s"w$i").mkString(" ")
    val b = a.replace("w30", "zz")
    val c = (1 to 60).map(i => s"q$i").mkString(" ")
    val Seq((ha, hb, hc)) = Seq((a, b, c)).toDF("a", "b", "c")
      .select(Dedup.simhash(Dedup.shingles($"a")),
        Dedup.simhash(Dedup.shingles($"b")),
        Dedup.simhash(Dedup.shingles($"c")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(ha, hb) < ham(ha, hc))
  }
}

class TextMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount and occurrences") {
    val df = Seq("the cat and the dog").toDF("t")
    val r = df.select(TextMetrics.tokenCount($"t").as("n"),
      TextMetrics.occ($"t", " the ").as("the")).collect()(0)
    assert(r.getDouble(0) == 5.0)
    assert(r.getDouble(1) == 1.0) // only the interior " the "
  }

  test("langId picks the language with most markers") {
    val tables = Seq(
      "en" -> Seq("the", "and"), "de" -> Seq("der", "und"))
    val df = Seq("x the y and z the q", "a der b und c der d").toDF("t")
    val out = df.select(TextMetrics.langId($"t", tables).as("l"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("en", "de"))
  }
}

class PercentileAggSpec extends SparkSpec {
  import spark.implicits._

  test("gather-sort percentile equals builtin percentile bit-exactly " +
      "across groups, percentiles, and group sizes") {
    val rnd = new scala.util.Random(17)
    val df = (1 to 5000).map(i => (s"g${i % 7}", rnd.nextDouble() * 1e6))
      .toDF("g", "v")
    for (p <- Seq(0.1, 0.2, 0.5, 0.999)) {
      val out = df.groupBy($"g").agg(
        percentile($"v", lit(p)).as("builtin"),
        PercentileAgg.percentileExact($"v", p).as("gather")).collect()
      out.foreach(r => assert(r.getDouble(1) == r.getDouble(2),
        s"p=$p g=${r.getString(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}"))
    }
    // single-element and two-element groups (interpolation edges)
    val tiny = Seq(("a", 5.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    val t = tiny.groupBy($"g").agg(
      percentile($"v", lit(0.25)).as("builtin"),
      PercentileAgg.percentileExact($"v", 0.25).as("gather")).collect()
    t.foreach(r => assert(r.getDouble(1) == r.getDouble(2)))
  }

  test("nulls are ignored exactly like the builtin percentile") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)),
      ("a", None)).toDF("g", "v")
    val r = df.groupBy($"g").agg(
      percentile($"v", lit(0.5)).as("builtin"),
      PercentileAgg.percentileExact($"v", 0.5).as("gather")).head()
    // a null-coercing encoder would count the two nulls as 0.0 and
    // report 0.5 here instead of 2.0
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 2.0)
  }
}

class SimHashAggSpec extends SparkSpec {
  import spark.implicits._

  test("vote-buffer simhash equals the 64-conditional-sums form") {
    val rnd = new scala.util.Random(23)
    val df = (1 to 400).map(_ => (rnd.nextInt(5).toLong, rnd.nextLong()))
      .toDF("id", "h")
    val sums = df.groupBy($"id")
      .agg((0 until 64).map { j =>
        sum(when(shiftright($"h", j).bitwiseAND(1L) === 1L, 1L)
          .otherwise(-1L)).as(s"v$j")
      }.head, (1 until 64).map { j =>
        sum(when(shiftright($"h", j).bitwiseAND(1L) === 1L, 1L)
          .otherwise(-1L)).as(s"v$j")
      }: _*)
      .select($"id", (0 until 64).map(j =>
        when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
        .reduce(_ + _).as("expected"))
    val agg = df.groupBy($"id").agg(SimHashAgg.simhash($"h").as("got"))
    val joined = sums.join(agg, "id").collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(1) == r.getLong(2)))
  }
}

/** Context-window chunking edges. */
class ChunkSpec extends graft.SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, ov: Int) =
    Seq(text).toDF("t")
      .select(explode(TextMetrics.chunks(col("t"), size, ov)).as("c"))
      .select("c.start_tok", "c.chunk_text")
      .as[(Int, String)].collect().toSeq

  test("chunks: overlap windows, clamped tail, short-doc single chunk") {
    val words = (1 to 10).map(i => s"w$i")
    val out = chunksOf(words.mkString(" "), size = 4, ov = 1)
    assert(out == Seq(
      (0, "w1 w2 w3 w4"), (3, "w4 w5 w6 w7"), (6, "w7 w8 w9 w10"),
      (9, "w10")))                      // clamped final window
    assert(chunksOf("one two", 40, 10) == Seq((0, "one two")))
    assert(chunksOf("", 4, 1) == Seq((0, "")))
  }

  test("chunks: invalid overlap fails fast") {
    intercept[IllegalArgumentException] {
      TextMetrics.chunks(lit("x"), chunkTokens = 4, overlap = 4)
    }
  }
}
