package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot log check (dev tool): the GLOBAL percentileSelect path must
  * not trigger WindowExec's "No Partition Defined" warning after the
  * non-foldable constant-key fix (PercentileAgg.scala, round 7). */
object WarnCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1 to 100000).map(_.toDouble).toDF("v")
    val r = graft.ops.PercentileAgg.percentileSelect(df, Nil, "v", 0.9)
      .collect()
    println(s"WARNCHECK result=${r.mkString(",")}")
    spark.stop()
  }
}
