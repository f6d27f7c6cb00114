package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Interleaved A/B: row-local MinhashSig expression vs the relational
  * explode→window→groupBy signature builder, full signature table
  * materialized (count over a checksum column defeats pruning).
  *
  *   sbt "runMain graft.tools.MinhashFormBench [sfDir] [pairs]"
  */
object MinhashFormBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val pairs = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .localCheckpoint(true)
    println(s"[mfb] docs=${docs.count()}")

    def run(f: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      // xor-fold: order-independent, overflow-free under ANSI mode
      val chk = f.agg(expr("bit_xor(sig[0] ^ sig[31])"))
        .collect()(0).getLong(0)
      ((System.nanoTime() - t0) / 1e9, chk)
    }
    (1 to pairs).foreach { p =>
      val (tExpr, cE) =
        run(Dedup.minhashSignatures(docs, "doc_id", "text"))
      val (tRel, cR) =
        run(Dedup.minhashSignaturesRelational(docs, "doc_id", "text"))
      assert(cE == cR, s"checksum mismatch $cE vs $cR")
      println(f"[mfb] pair $p: expr $tExpr%6.2f s  relational $tRel%6.2f s" +
        f"  speedup ${tRel / tExpr}%5.2fx")
    }
    spark.stop()
  }
}
