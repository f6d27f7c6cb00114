package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.SparkSpec
import graft.ops.TextMetrics

/** The STREAMING counterpart of the pipeline_curate composition: a JSONL
  * line stream → contract parse with quarantine → quality/repetition
  * filter → online near-dup admission (the persistent LSH store). The
  * pre-dedup stages are pure column logic, so they lift from the batch
  * pipeline onto the streaming DataFrame UNCHANGED — this spec pins
  * that the composed admission stream (a) admits clean quality docs,
  * (b) drops corrupt lines at the parse, (c) drops low-quality docs at
  * the filter, and (d) rejects a cross-BATCH near-duplicate via the
  * store — end to end, not per stage. */
class StreamingCurateSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", org.apache.spark.sql.types.LongType),
    StructField("text", StringType)))

  private def jline(id: Long, text: String): String =
    s"""{"doc_id": $id, "text": "$text"}"""

  test("jsonl stream -> quarantine -> quality filter -> LSH admission: " +
      "each stage drops what it must, across batches") {
    val dir = java.nio.file.Files.createTempDirectory("cur_in").toString
    val store = java.nio.file.Files.createTempDirectory("cur_store").toString
    val admitted = java.nio.file.Files.createTempDirectory("cur_adm").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cur_ck").toString

    val longText = (1 to 50).map(i => s"tok$i").mkString(" ")
    // batch 0: one clean long doc, one corrupt line, one degenerate
    // repetition doc (dup_token_frac = 1 - 1/8 > 0.7), one short doc
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "b0.jsonl"),
      Seq(
        jline(10, longText),
        """{"doc_id": 11, "text": "trunca""",
        jline(12, Seq.fill(8)("spam").mkString(" ")),
        jline(13, "too few words here")).mkString("\n"))

    val lines = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(dir)
    val (clean, _) =
      graft.sources.JsonlSource.parseWithQuarantine(lines, schema)
    val quality = clean.where(
      TextMetrics.tokenCount(col("text")) >= 5 &&
        TextMetrics.repetitionFeatures(col("text"))
          .getField("dup_token_frac") <= 0.7)
    val q = StreamingDedup.start(spark, quality, "doc_id", "text",
      store, admitted, ckpt)
    try {
      q.processAllAvailable()
      // batch 1: a 1-token mutation of doc 10 (cross-batch near-dup —
      // must be rejected via the store) and a fresh doc (admitted)
      val mutated = longText.replace("tok25", "mutant")
      val fresh = (1 to 50).map(i => s"other$i").mkString(" ")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "b1.jsonl"),
        Seq(jline(20, mutated), jline(21, fresh)).mkString("\n"))
      q.processAllAvailable()

      val out = spark.read.parquet(admitted)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(out == Set(10L, 21L),
        s"admitted set should be the clean doc and the fresh doc, got $out")
      // the store holds band rows ONLY for admitted, signature-bearing
      // docs — the rejected/quarantined/short ones left nothing behind
      val storeIds = spark.read.parquet(store)
        .select("id").distinct().collect().map(_.getLong(0)).toSet
      assert(storeIds == Set(10L, 21L))
    } finally q.stop()
  }
}
