package graft.tools

import org.apache.spark.sql.SparkSession

/** Explain-audit for the pipeline_curate stage boundaries (SCALE_r09.md):
  * the final query plan only shows the tail past the last checkpoint, so
  * this probe explains the INGEST→FILTER→EXACT-DEDUP stage standalone —
  * via the SAME `CurateStages.cleanedCorpus` builder the shipping query
  * materializes, so the audited plan cannot drift from the code. The
  * claim under audit: one corpus scan, predicates riding it, one
  * map-side-combining exchange. */
object CuratePlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println("===== pipeline_curate stage 1-3 (ingest->filter->exact-dedup) =====")
    graft.queries.CurateStages.cleanedCorpus(spark, docs).explain("formatted")
    spark.stop()
  }
}
