package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** JSONL ingest: the schema contract (extra fields ignored, missing
  * fields null), corrupt-line quarantine with the raw text intact, and
  * a write→read round trip against the parquet corpus. */
class JsonlSourceSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("clean/corrupt split with the raw line preserved") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr", "extra": 9}""",
      """{"doc_id": 3, "text": "missing lang"}""",
      """{"doc_id": 4, "text": "truncat""", // cut mid-string
      """not json at all""",
      "",
      """{"doc_id": 5, "text": "ok", "lang": "de"}""")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-0.jsonl"),
      lines.mkString("\n"))
    val (clean, corrupt) =
      JsonlSource.readWithQuarantine(spark, dir, schema)
    val c = clean.orderBy("doc_id").collect()
    assert(c.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 5L))
    assert(c(1).getString(2) == "fr") // extra field ignored, lang kept
    assert(c(2).isNullAt(2)) // missing field -> null, still clean
    val bad = corrupt.collect().map(_.getString(0)).toSet
    assert(bad == Set("""{"doc_id": 4, "text": "truncat""",
      "not json at all", ""))
  }

  test("parseWithQuarantine over in-plan lines == the file path (the " +
      "curation pipeline's ingest seam), fully lazy") {
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """not json""",
      """{"doc_id": 2, "text": "ok", "lang": "de"}""").toDF("raw")
    val (clean, corrupt) = JsonlSource.parseWithQuarantine(lines, schema)
    assert(clean.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
      == Seq(1L, 2L))
    assert(corrupt.collect().map(_.getString(0)).toSeq == Seq("not json"))
    // any single-string column name works — the first column is the line
    val renamed = JsonlSource.parseWithQuarantine(
      lines.withColumnRenamed("raw", "value"), schema)
    assert(renamed._1.count() == 2)
    // including a name containing a DOT (would mis-parse as a nested
    // path without the backtick quoting)
    val dotted = JsonlSource.parseWithQuarantine(
      lines.withColumnRenamed("raw", "log.raw"), schema)
    assert(dotted._1.count() == 2 && dotted._2.count() == 1)
  }

  test("the same contract parse runs over a STREAMING text source — " +
      "clean rows and quarantine both flow as streams") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_stream").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "b0.jsonl"),
      Seq("""{"doc_id": 1, "text": "hello", "lang": "en"}""",
        "garbage line",
        """{"doc_id": 2, "text": "more", "lang": "fr"}""").mkString("\n"))
    val lines = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))
      .text(dir)
    // parseWithQuarantine is pure column logic, so it lifts to the
    // streaming DataFrame unchanged — the seam the scaladoc promises
    val (clean, corrupt) = JsonlSource.parseWithQuarantine(lines, schema)
    val q1 = clean.writeStream.format("memory").queryName("jl_clean")
      .outputMode("append").start()
    val q2 = corrupt.writeStream.format("memory").queryName("jl_bad")
      .outputMode("append").start()
    try {
      q1.processAllAvailable(); q2.processAllAvailable()
      val got = spark.table("jl_clean").orderBy("doc_id").collect()
      assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L))
      val bad = spark.table("jl_bad").collect().map(_.getString(0)).toSeq
      assert(bad == Seq("garbage line"))
    } finally { q1.stop(); q2.stop() }
  }

  test("write -> read round trip against the parquet corpus") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("jsonl_rt").toString
    docs.write.mode("overwrite").json(dir)
    val (clean, corrupt) = JsonlSource.readWithQuarantine(spark, dir, schema)
    assert(corrupt.count() == 0)
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = clean.orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
