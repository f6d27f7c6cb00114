package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** The round-8 scale-growth experiment (VERDICT r7 "Next #1"): run the
  * fixed-overhead-claim queries (the dedup trio, the percentile-routing
  * pair, k-means) and two data-bound controls at 1× and 10× data volume
  * (ScaleGen corpora), interleaved, and report T(10×)/T(1×) per query.
  *
  * The claim under test: the dedup trio's ~2-3.5 s toy-scale cost and
  * a5/a12's multi-job routing are ITERATION/SCHEDULER overhead — flat in
  * data volume — so their growth must be ≪10×, while the data-bound
  * controls grow toward ~10× (at constant scan-task count; ScaleGen
  * writes both scales with the same file count). Interleaving 1× and
  * 10× legs inside each pair keeps the host's memory-bus regime shared;
  * the mem-streaming calibration leg (same as Bench) tags the regime.
  *
  *   sbt "runMain graft.tools.ScaleBench [base] [pairs] [queries...]"
  */
object ScaleBench {

  val DefaultQueries: Seq[String] = Seq(
    // fixed-overhead claims under test
    "dedup_groups", "dedup_canonical", "dedup_minhash_groups",
    "a5_global_threshold", "a12_group_percentile", "cluster_kmeans",
    // data-bound controls
    "dedup_exact", "text_repetition")

  def main(args: Array[String]): Unit = {
    val base = if (args.length > 0) args(0) else "/root/repo/tmp/scalegen"
    val pairs = if (args.length > 1) args(1).toInt else 3
    val queries =
      if (args.length > 2) args.drop(2).toSeq else DefaultQueries
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def once(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def memGBps(): Double = {
      val n = spark.sparkContext.defaultParallelism
      val t0 = System.nanoTime()
      spark.sparkContext.parallelize(1 to n, n).map { _ =>
        val len = 8 << 20
        val a = new Array[Long](len)
        var i = 0
        while (i < len) { a(i) = i.toLong; i += 1 }
        var acc = 0L; var pass = 0
        while (pass < 12) {
          i = 0
          while (i < len) { acc += a(i); i += 1 }
          pass += 1
        }
        acc
      }.reduce(_ + _)
      val sec = (System.nanoTime() - t0) / 1e9
      12.0 * 64 * 1024 * 1024 * n / sec / 1e9
    }

    println(f"[scale] mem-leg before: ${memGBps()}%6.1f GB/s")
    val results = queries.map { q =>
      // warm both scales once (codegen/JIT), then interleaved pairs
      once(q, s"$base/g01"); once(q, s"$base/g1")
      val runs = (1 to pairs).map { p =>
        val t1 = once(q, s"$base/g01")
        val t10 = once(q, s"$base/g1")
        println(f"[scale] $q%-22s pair $p: 1x $t1%6.2f s  10x $t10%6.2f s" +
          f"  growth ${t10 / t1}%5.2fx")
        (t1, t10)
      }
      def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
      val m1 = med(runs.map(_._1)); val m10 = med(runs.map(_._2))
      println(f"[scale] $q%-22s MEDIAN: 1x $m1%6.2f s  10x $m10%6.2f s" +
        f"  growth ${m10 / m1}%5.2fx")
      (q, m1, m10)
    }
    println(f"[scale] mem-leg after: ${memGBps()}%6.1f GB/s")
    println("[scale] summary (median of interleaved pairs):")
    results.foreach { case (q, m1, m10) =>
      println(f"[scale]   $q%-22s ${m10 / m1}%5.2fx  (1x $m1%6.2f s, " +
        f"10x $m10%6.2f s)")
    }
    spark.stop()
  }
}
