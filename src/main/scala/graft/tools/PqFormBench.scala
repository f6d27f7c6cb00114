package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Pq

/** Interleaved A/B of the two PQ encode forms (relational broadcast-join
  * + argmin window vs the row-local PqEncodeSig expression) on the
  * ScaleGen corpora — the wire-or-record measurement behind making the
  * expression the production path. A checksum over the code arrays
  * forces full evaluation and doubles as an equality witness.
  *
  *   runMain graft.tools.PqFormBench [scalegenBase] [pairs]
  */
object PqFormBench {
  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/repo/tmp/scalegen"
    val pairs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Seq("g01", "g1").foreach { g =>
      val e = spark.read.parquet(s"$base/$g/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val (cb, _) = Pq.train(e, "vec_id", "v", 8, 64, 16, 2)
      def sumCodes(df: org.apache.spark.sql.DataFrame): Long =
        df.select(sum(aggregate(col("codes"), lit(0L),
          (acc, c) => acc + c)).as("s")).collect()(0).getLong(0)
      def timed(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val s = f
        ((System.nanoTime() - t0) / 1e9, s)
      }
      // warm both paths
      sumCodes(Pq.encode(e, "vec_id", "v", cb, 8, 64))
      sumCodes(Pq.encodeLocal(e, "vec_id", "v", cb, 8, 64))
      (1 to pairs).foreach { p =>
        val (tr, sr) = timed(sumCodes(Pq.encode(e, "vec_id", "v", cb, 8, 64)))
        val (tl, sl) = timed(sumCodes(Pq.encodeLocal(e, "vec_id", "v", cb, 8, 64)))
        require(sr == sl, s"checksum mismatch: $sr != $sl")
        println(f"PQFORM $g pair $p: relational $tr%6.2f s  expression " +
          f"$tl%6.2f s  ratio ${tl / tr}%5.2fx  (checksum $sr)")
      }
    }
    spark.stop()
  }
}
