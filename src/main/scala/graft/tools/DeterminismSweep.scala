package graft.tools

import org.apache.spark.sql.SparkSession

/** Inventory-wide partitioning-determinism sweep: every oracle query is
  * executed twice in one session — re-PLANNED under two different
  * `spark.sql.shuffle.partitions` values — and the row sets must match
  * EXACTLY. Changing the reduce-partition count changes aggregation and
  * window partition boundaries, i.e. float accumulation orders, which
  * is precisely what the repo's cross-engine determinism rules
  * (decimal-routed sums, rounded-then-ranked scores, id tie-breaks)
  * exist to make irrelevant; per-operator specs pin this for single
  * operators, this sweep checks the WHOLE inventory so a new query
  * cannot quietly ship an accumulation-order dependence.
  *
  *   sbt "runMain graft.tools.DeterminismSweep [sfDir] [parts1] [parts2]"
  */
object DeterminismSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val p1 = if (args.length > 1) args(1) else "32"
    val p2 = if (args.length > 2) args(2) else "7"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", p1)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        spark.conf.set("spark.sql.shuffle.partitions", p1)
        val a = fn(spark, sfDir).collect().map(_.toString).sorted.toSeq
        spark.conf.set("spark.sql.shuffle.partitions", p2)
        val b = fn(spark, sfDir).collect().map(_.toString).sorted.toSeq
        val ok = a == b
        if (!ok) bad += 1
        println(s"DETSWEEP $name ${if (ok) "OK" else "MISMATCH"} " +
          s"rows=${a.length}/${b.length}")
      } catch { case e: Throwable =>
        bad += 1
        println(s"DETSWEEP $name ERROR ${e.getMessage}")
      }
    }
    println(s"DETSWEEP_TOTAL queries=${graft.SparkEntry.queries.size} " +
      s"failures=$bad")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
