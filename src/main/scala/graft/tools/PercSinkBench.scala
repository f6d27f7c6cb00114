package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B pairs (dev tool) for the round-6 critical-path fixes,
  * in ONE JVM so host throttle phases hit both legs alike:
  *
  *   A: per-frame exact percentile — gather-and-sort aggregator (one
  *      task per frame sorts the whole frame) vs distributed
  *      bucket-histogram rank selection (PercentileAgg.percentileSelect).
  *   B: mask TIFF sink — dense form (every pixel crosses the exchange)
  *      vs the shipped set-pixels-only form. File bytes asserted equal.
  *
  *   sbt "runMain graft.tools.PercSinkBench [nFrames] [size] [pairs]"
  */
object PercSinkBench {
  def main(args: Array[String]): Unit = {
    val nFrames = if (args.length > 0) args(0).toInt else 2
    val size = if (args.length > 1) args(1).toInt else 2880
    val pairs = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "1200s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // deterministic pseudo-random frame values with a ~40% zero spike —
    // the gradient-field shape that stresses tie handling
    val n = nFrames.toLong * size * size
    val px = spark.range(n).select(
        (col("id") % nFrames).as("frame_no"),
        ((col("id") / nFrames) / size).cast("int").as("y"),
        ((col("id") / nFrames) % size).cast("int").as("x"),
        when(pmod(xxhash64(col("id")), lit(5)) < 2, lit(0.0))
          .otherwise((pmod(xxhash64(col("id"), lit(7)), lit(2000001))
            .cast("double") - 1000000.0) / 1000.0).as("v"))
      .localCheckpoint(true)
    println(s"[psbench] rows = ${px.count()} (${nFrames}x${size}x$size)")

    // ---------------- A: percentile forms ----------------
    def pctAgg(): Map[Long, Double] = px.groupBy(col("frame_no"))
      .agg(graft.ops.PercentileAgg.percentileExact(col("v"), 0.1)
        .as("p")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def pctSel(): Map[Long, Double] = graft.ops.PercentileAgg
      .percentileSelect(px, Seq("frame_no"), "v", 0.1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    for (i <- 1 to pairs) {
      val (ra, ta) = time(pctAgg())
      val (rb, tb) = time(pctSel())
      require(ra.keySet == rb.keySet &&
        ra.forall { case (k, v) =>
          java.lang.Double.compare(v, rb(k)) == 0 },
        s"percentile mismatch: $ra vs $rb")
      println(f"[psbench] pct pair $i: gather $ta%8.2f s  select $tb%8.2f s" +
        f"  ratio ${ta / tb}%6.2f x")
    }

    // ---------------- B: mask sink forms ----------------
    // mask shape: sparse flags (~0.1% spots, ~2% arcs)
    val flags = px.select(col("frame_no"), col("y"), col("x"),
        (pmod(xxhash64(col("frame_no"), col("y"), col("x")), lit(1000)) < 1)
          .as("is_spot"),
        (pmod(xxhash64(col("y"), col("x"), col("frame_no")), lit(50)) < 1)
          .as("is_arc"))
      .localCheckpoint(true)
    flags.count()

    def denseSink(dir: String): Unit = {
      val names = Seq("spots", "arcs"); val w = size; val h = size
      val hc = graft.core.Fs.onExecutors(spark)
      graft.core.Fs.mkdirs(dir, graft.core.Fs.conf(spark))
      flags.select(col("frame_no").cast("int"), col("y").cast("int"),
          col("x").cast("int"), col("is_spot"), col("is_arc"))
        .repartition(col("frame_no"))
        .sortWithinPartitions(col("frame_no"))
        .foreachPartition { (it: Iterator[Row]) =>
          var cur = Int.MinValue
          var mats: Array[Array[Array[Int]]] = null
          def flush(): Unit = if (mats != null)
            names.zipWithIndex.foreach { case (nm, i) =>
              graft.core.Fs.write(f"$dir/frame-$cur%05d_$nm.tif",
                graft.sources.FrameSource.encodeTiff(mats(i)), hc.value)
            }
          it.foreach { r =>
            val f = r.getInt(0)
            if (f != cur) {
              flush(); cur = f
              mats = Array.fill(2)(Array.ofDim[Int](h, w))
            }
            val y = r.getInt(1); val x = r.getInt(2)
            if (r.getBoolean(3)) mats(0)(y)(x) = 1
            if (r.getBoolean(4)) mats(1)(y)(x) = 1
          }
          flush()
        }
    }
    def sparseSink(dir: String): Unit =
      graft.sinks.Sinks.writeMaskTiffs(flags, size, size, dir,
        Seq("spots" -> col("is_spot"), "arcs" -> col("is_arc")))

    for (i <- 1 to pairs) {
      val da = java.nio.file.Files.createTempDirectory("psb_dense").toString
      val db = java.nio.file.Files.createTempDirectory("psb_sparse").toString
      val (_, ta) = time(denseSink(da))
      val (_, tb) = time(sparseSink(db))
      val fa = new java.io.File(da).listFiles().sortBy(_.getName)
      val fb = new java.io.File(db).listFiles().sortBy(_.getName)
      require(fa.map(_.getName).sameElements(
        fb.map(f => f.getName.replaceFirst("frame-", "frame-"))),
        "file sets differ")
      fa.zip(fb).foreach { case (a, b) =>
        require(java.util.Arrays.equals(
          java.nio.file.Files.readAllBytes(a.toPath),
          java.nio.file.Files.readAllBytes(b.toPath)),
          s"bytes differ: ${a.getName}")
      }
      println(f"[psbench] sink pair $i: dense $ta%8.2f s  sparse $tb%8.2f s" +
        f"  ratio ${ta / tb}%6.2f x  (${fa.length} files byte-equal)")
      fa.foreach(_.delete()); fb.foreach(_.delete())
    }
    spark.stop()
  }
}
