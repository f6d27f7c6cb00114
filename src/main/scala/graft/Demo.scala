package graft

import org.apache.spark.sql.SparkSession

/** Runs the flagship per-frame pipeline (SparkEntry.entry) standalone and
  * prints the integral table head — the same call the driver smoke-checks.
  * `sbt "runMain graft.Demo"` */
object Demo {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.printSchema()
    val n = df.count()
    df.show(10, truncate = false)
    println(s"ENTRY_ROWS=$n")
    if (args.contains("--explain")) df.explain("formatted")
    spark.stop()
  }
}
