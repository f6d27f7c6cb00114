package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen paths once so fixed startup cost is not
    // attributed to whichever query runs first
    try SparkEntry.queries("q1_pricing")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        // two iterations, report the SECOND: the first run pays Janino
        // codegen compilation and JIT warm-up, which made round-over-round
        // per-query deltas noise-dominated (cold-start variance is the
        // startup story, not the operator's steady-state cost)
        def once(): Double = {
          val t0 = System.nanoTime()
          // noop sink: materializes every output column (count() would
          // let the optimizer prune the aggregates away)
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}") }
          (System.nanoTime() - t0) / 1e9
        }
        once()
        name -> once()
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // Host-noise calibration: a fixed-cost, engine-independent probe
    // (pure codegen sum over a constant range — no I/O, no shuffle read,
    // CPU+memory-bandwidth bound) timed the same two-iteration way. The
    // sandbox host's memory bandwidth swings 10-50x between rounds
    // (SCALE_r05/r06); total/calibration is comparable across rounds
    // where raw totals are not.
    def calOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(500000000L).selectExpr("sum(id * 2 + 1) as s")
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    calOnce()
    val calibration = calOnce()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"calibration_sec":$calibration,"total_over_calibration":${total / calibration},"sf":"$sfDir"}""")
    spark.stop()
  }
}
