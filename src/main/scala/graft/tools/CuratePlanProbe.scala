package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextMetrics

/** Explain-audit for the pipeline_curate stage boundaries (SCALE_r09.md):
  * the final query plan only shows the tail past the last checkpoint, so
  * this probe rebuilds the INGEST→FILTER→EXACT-DEDUP stage standalone
  * and prints its physical plan — the claim under audit is "one corpus
  * scan, predicates riding it, one map-side-combining exchange". */
object CuratePlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val lines = docs.where(col("doc_id") >= 50)
      .select(to_json(struct(col("doc_id"), col("lang"), col("text"),
        col("n_chars"))).as("raw"))
      .unionByName(Seq(
        """{"doc_id": 999999, "lang": "xx", "text": "truncated""",
        "definitely not json", "").toDF("raw"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("text", StringType), StructField("n_chars", LongType)))
    val (clean, _) =
      graft.sources.JsonlSource.parseWithQuarantine(lines, schema)
    val q = clean.where(
      TextMetrics.tokenCount(col("text")) >= 5 &&
        TextMetrics.repetitionFeatures(col("text"))
          .getField("dup_token_frac") <= 0.7)
    val s1 = q.groupBy(md5(col("text")).as("__h"))
      .agg(min(struct(col("doc_id"), col("lang"), col("text"),
        col("n_chars"))).as("__r"))
      .select(col("__r.doc_id").as("doc_id"), col("__r.lang").as("lang"),
        col("__r.text").as("text"), col("__r.n_chars").as("n_chars"))
    println("===== pipeline_curate stage 1-3 (ingest->filter->exact-dedup) =====")
    s1.explain("formatted")
    spark.stop()
  }
}
