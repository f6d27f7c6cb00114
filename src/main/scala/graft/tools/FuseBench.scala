package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.stencil.{CCL, Morphology}

/** A/B microbenchmark for the classify chain's opening moves: the chained
  * relational form (Morphology.closing → CCL.labelAuto — 7+ small jobs)
  * vs the fused one-shuffle CCL.closeAndLabel. Warm in-JVM iterations on
  * a synthetic sparse outlier mask at production frame size; both paths
  * checked to produce identical label sets before timing.
  *
  *   sbt "runMain graft.tools.FuseBench [nFrames] [size] [activePer10k] [iters]"
  */
object FuseBench {
  def main(args: Array[String]): Unit = {
    val nFrames = if (args.length > 0) args(0).toInt else 8
    val size = if (args.length > 1) args(1).toInt else 2880
    val per10k = if (args.length > 2) args(2).toInt else 30
    val iters = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-fuse-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // survive multi-minute GC stalls on the throttled sandbox host
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "1200s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // synthetic outlier mask: scattered points + a few dense blobs per
    // frame (≈ the ring-outlier + spot structure classify actually sees)
    val nScatter = (size.toLong * size * per10k / 10000).toInt
    val mask = (1 to nFrames).flatMap { f =>
      val rnd = new scala.util.Random(f)
      val scatter = (1 to nScatter)
        .map(_ => (f, rnd.nextInt(size), rnd.nextInt(size)))
      val blobs = (1 to 20).flatMap { b =>
        val cy = rnd.nextInt(size - 40) + 20
        val cx = rnd.nextInt(size - 40) + 20
        for { dy <- -6 to 6; dx <- -6 to 6 if dy * dy + dx * dx <= 36 }
          yield (f, cy + dy, cx + dx)
      }
      (scatter ++ blobs).distinct
    }
    val df = mask.toDF("frame_no", "y", "x").localCheckpoint(true)
    println(s"FUSE_BENCH mask rows = ${df.count()} " +
      s"($nFrames frames x $size x $size, ~$per10k/10k active)")

    def chained() = CCL.labelAuto(
      Morphology.closing(df, 1, Seq("frame_no"), size, size),
      size, size, Seq("frame_no"))
    def fused() = CCL.closeAndLabel(df, 1, size, size, Seq("frame_no"))

    // correctness gate: identical (frame, y, x) -> label maps
    val a = chained().collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    val b = fused().collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) -> r.getLong(3))
      .toMap
    require(a == b, s"fused/chained disagree: ${a.size} vs ${b.size} rows")
    println(s"FUSE_BENCH outputs identical (${a.size} labeled px)")

    // INTERLEAVED pairs: the sandbox host's throughput swings far more
    // than the effect under test, so only the within-pair ratio is
    // meaningful — each (chained, fused) pair runs back-to-back under
    // the same host state.
    def once(run: () => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      run().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val ratios = (1 to iters).map { i =>
      val c = once(() => chained())
      val f = once(() => fused())
      println(f"FUSE_BENCH pair$i chained $c%7.2f s  fused $f%7.2f s  " +
        f"ratio ${c / f}%5.2f x")
      c / f
    }
    val gm = math.exp(ratios.map(math.log).sum / ratios.size)
    println(f"FUSE_BENCH geomean speedup ${gm}%5.2f x over $iters pairs")
    spark.stop()
  }
}
