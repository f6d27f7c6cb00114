package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.WarcSource

/** The record-bound demonstration for the path-transport WARC reader
  * (SCALE_r13 §2): generate ONE plain `.warc` segment bigger than both
  * the binaryFile source's 2 GiB content ceiling AND the probe JVM's
  * whole heap (run with SPARK_DRIVER_MEM=2g), then
  *  (a) attempt the r12 CONTENT transport (binaryFile → parseBinary) —
  *      expected to refuse/fail: a >2 GiB file cannot enter a row;
  *  (b) parse it via the r13 PATH transport (parsePaths) — expected to
  *      stream clean: memory is one record, the segment size is
  *      irrelevant.
  * A segment larger than the heap parsing clean IS the per-record
  * bound, observed — not a plan-shape argument.
  *
  *   env SPARK_DRIVER_MEM=2g sbt "runMain graft.tools.WarcBigSegProbe [GiB] [recMiB]"
  */
object WarcBigSegProbe {
  def main(args: Array[String]): Unit = {
    val gib = if (args.nonEmpty) args(0).toDouble else 3.0
    val recMiB = if (args.length > 1) args(1).toInt else 1
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"WARCBIG heap=${Runtime.getRuntime.maxMemory() >> 20} MiB")

    val dir = java.nio.file.Files.createTempDirectory("warc_bigseg")
    val seg = dir.resolve("big.warc")
    val payload = new Array[Byte](recMiB << 20)
    java.util.Arrays.fill(payload, 'x'.toByte)
    val nRecs = math.ceil(gib * 1024 / recMiB).toInt
    val t0 = System.nanoTime()
    val out = new java.io.BufferedOutputStream(
      java.nio.file.Files.newOutputStream(seg), 1 << 20)
    try {
      val ascii = java.nio.charset.StandardCharsets.ISO_8859_1
      for (i <- 0 until nRecs) {
        out.write((s"WARC/1.0\r\nWARC-Type: response\r\n" +
          s"WARC-Record-ID: <urn:graft:big:$i>\r\n" +
          s"Content-Length: ${payload.length}\r\n\r\n").getBytes(ascii))
        out.write(payload)
        out.write("\r\n\r\n".getBytes(ascii))
      }
    } finally out.close()
    val segBytes = java.nio.file.Files.size(seg)
    println(f"WARCBIG generated $nRecs recs, " +
      f"${segBytes / 1024.0 / 1024 / 1024}%.2f GiB in " +
      f"${(System.nanoTime() - t0) / 1e9}%.0f s")

    // (a) the r12 content transport: the whole segment as one row
    val contentFail =
      try {
        val n = WarcSource.parseBinary(
          spark.read.format("binaryFile").load(dir.toString)).count()
        s"UNEXPECTEDLY SUCCEEDED ($n records)"
      } catch {
        case e: Throwable =>
          val root = Iterator.iterate(e)(_.getCause)
            .takeWhile(_ != null).toSeq.last
          s"refused as expected: ${root.getClass.getSimpleName}: " +
            String.valueOf(root.getMessage).take(120)
      }
    println(s"WARCBIG content-transport -> $contentFail")

    // (b) the r13 path transport: segment >> heap, parsed per record
    val t1 = System.nanoTime()
    val recs = WarcSource.parsePaths(
      spark.read.format("binaryFile").load(dir.toString)
        .select(col("path")),
      graft.core.Fs.onExecutors(spark))
      .agg(count(lit(1)), sum(when(col("corrupt"), 1).otherwise(0)),
        sum(length(col("payload")))).collect()(0)
    val sec = (System.nanoTime() - t1) / 1e9
    println(f"WARCBIG path-transport  -> ${recs.getLong(0)} records " +
      f"(${recs.getLong(1)} corrupt), ${recs.getLong(2)} payload bytes, " +
      f"$sec%.1f s (${segBytes / sec / 1e6}%.0f MB/s)")

    java.nio.file.Files.deleteIfExists(seg)
    java.nio.file.Files.deleteIfExists(dir)
    spark.stop()
  }
}
