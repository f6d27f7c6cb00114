package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.sources.WarcSource
import graft.streaming.StreamingCuration

/** Throughput probe for the WARC → curation-funnel streaming seam
  * (SCALE_r12 §5b): the sf documents table rendered as WARC segment
  * files (one response record per document, one segment per
  * micro-batch), streamed through `streamDocumentLines` →
  * `StreamingCuration` (base 3-stage mode — the corpus carries no
  * stratum column for budgets), wall-clocked end to end. The number to
  * compare against is CurateStreamBench's base3 leg over the SAME
  * corpus as JSONL — the delta is the WARC record-parse + re-render
  * cost. Rendering happens BEFORE the clock, like the JSONL probe.
  *
  * `segsPerBatch` splits each micro-batch's documents across that many
  * segment FILES: WARC parses at file grain (the format's own
  * parallelism — SCALE_r12 §5), so one segment per batch pins the
  * parse to one core while JSONL line-splits across all of them; more
  * segments per trigger is exactly how a production drop recovers the
  * parallelism.
  *
  *   sbt "runMain graft.tools.WarcStreamBench [sfDir] [batches] [segsPerBatch]"
  */
object WarcStreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val batches = if (args.length > 1) args(1).toInt else 4
    val segsPerBatch = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val in = java.nio.file.Files.createTempDirectory("wsb_in")
    val out = java.nio.file.Files.createTempDirectory("wsb_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("wsb_ck").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
    val nDocs = docs.length
    val nSegs = batches * segsPerBatch
    docs.grouped(math.max(1, (nDocs + nSegs - 1) / nSegs))
      .zipWithIndex.foreach { case (grp, i) =>
        val outStream = new java.io.ByteArrayOutputStream(1 << 20)
        grp.foreach { r =>
          val payload = r.getString(1)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          outStream.write(WarcSource.render("WARC/1.0", Seq(
            WarcSource.Hdr("WARC-Type", "response"),
            WarcSource.Hdr("WARC-Record-ID",
              s"<urn:graft:doc:${r.getLong(0)}>"),
            WarcSource.Hdr("WARC-Date", "2026-01-01T00:00:00Z"),
            WarcSource.Hdr("WARC-Target-URI",
              s"http://corpus.example/doc/${r.getLong(0)}"),
            WarcSource.Hdr("Content-Type", "text/plain"),
            WarcSource.Hdr("Content-Length", payload.length.toString)),
            payload))
        }
        java.nio.file.Files.write(in.resolve(f"seg$i%03d.warc"),
          outStream.toByteArray)
      }

    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("record_id", StringType), StructField("url", StringType),
      StructField("text", StringType)))
    // same rule config as CurateStreamBench's base3 leg — the
    // comparison number
    val cfg = StreamingCuration.Config(minWords = 5,
      stopwords = Seq("small", "join", "filter", "order", "key",
        "stream", "line", "query"))
    val lines = WarcSource.streamDocumentLines(spark, in.toString,
      options = Map("maxFilesPerTrigger" -> segsPerBatch.toString))
    val t0 = System.nanoTime()
    val q = StreamingCuration.start(spark, lines, schema, "doc_id",
      "text", out, ckpt, cfg)
    try q.processAllAvailable() finally q.stop()
    val sec = (System.nanoTime() - t0) / 1e9

    val admitted = spark.read.parquet(s"$out/admitted").count()
    println(f"WARCSTREAM docs=$nDocs batches=$batches segs=$nSegs wall=$sec%.1f s" +
      f"  ${nDocs / sec}%.0f docs/s  admitted=$admitted")
    spark.stop()
  }
}
