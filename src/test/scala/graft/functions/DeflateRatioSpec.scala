package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TextMetrics

/** Compression-ratio signal: reference equality against a direct
  * Deflater call, the discrimination the filter exists for, edge
  * conventions, and rerun/partitioning stability. */
class DeflateRatioSpec extends SparkSpec {
  import spark.implicits._

  private def ratios(texts: Seq[String]): Seq[Double] =
    texts.toDF("text")
      .select(TextMetrics.compressionRatio(col("text")).as("r"))
      .collect().map(_.getDouble(0)).toSeq

  private def refRatio(s: String): Double = {
    val raw = s.getBytes("UTF-8")
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](8192)
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    d.end()
    BigDecimal(out.toDouble / raw.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("matches a direct Deflater reference bit-for-bit") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "x", "mixed 123 !@# content with SOME variety 456")
    assert(ratios(texts) == texts.map(refRatio))
  }

  test("discriminates repetitive boilerplate from varied prose from noise") {
    val boiler = ("click here to subscribe " * 50).trim
    val prose = (1 to 50).map(i =>
      s"sentence $i carries its own distinct words like item${i * 7}")
      .mkString(" ")
    // xorshift-ish deterministic pseudo-random bytes as a string
    var x = 88172645463325252L
    val noise = (1 to 400).map { _ =>
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (math.abs(x % 94) + 33).toChar
    }.mkString
    val Seq(rB, rP, rN) = ratios(Seq(boiler, prose, noise))
    assert(rB < 0.1, s"boilerplate should crush: $rB")
    assert(rP > rB * 3 && rP < 0.8, s"prose in the middle: $rP")
    assert(rN > 0.8, s"noise incompressible: $rN")
  }

  test("edge conventions: null -> null, empty -> 1.0") {
    val got = Seq(Some("abc def"), None, Some(""))
      .toDF("text")
      .select(TextMetrics.compressionRatio(col("text")).as("r"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(1).isEmpty)
    assert(got(2).contains(1.0))
  }

  test("rerun- and partitioning-stable") {
    val texts = (1 to 60).map(i => s"document $i " * (i % 9 + 1))
    val df = texts.toDF("text")
    val a = df.select(TextMetrics.compressionRatio(col("text")))
      .collect().map(_.getDouble(0)).toSeq
    val b = df.repartition(7)
      .select(TextMetrics.compressionRatio(col("text")))
      .collect().map(_.getDouble(0)).sorted.toSeq
    assert(a.sorted == b)
    assert(a == df.select(TextMetrics.compressionRatio(col("text")))
      .collect().map(_.getDouble(0)).toSeq)
  }
}
