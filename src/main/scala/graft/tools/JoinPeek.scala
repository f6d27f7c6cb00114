package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.SyntheticFrame
import graft.geometry.Geometry
import graft.pipeline.FramePipeline

/** Dev tool: show the physical join strategy of the flagged-join-flags
  * branch that feeds the integrals. */
object JoinPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cal = SyntheticFrame.testCalibration(192)
    val geo = Geometry.build(spark, cal)
    val frame = SyntheticFrame.frame(spark, cal, 1,
      spots = Seq((60, 80, 20000.0, 2.0)))
    val out = FramePipeline.process(frame, geo, cal)
    val plan = out.integrals.queryExecution.executedPlan.toString
    println("JOINS: " + "SortMergeJoin|BroadcastHashJoin".r
      .findAllIn(plan).toSeq.groupBy(identity).view.mapValues(_.size).toMap)
    println(plan.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange")).mkString("\n"))
    println("WSCG spans: " + "WholeStageCodegen \\(\\d+\\)".r
      .findAllIn(plan).toSeq.distinct.size)
    val cg = out.integrals.queryExecution.debug
    // per-subtree codegen: surface any fallback to interpreted mode
    org.apache.spark.sql.execution.debug.codegenStringSeq(
      out.integrals.queryExecution.executedPlan).zipWithIndex.foreach {
      case ((subtree, code, _), i) =>
        println(s"--- subtree $i: ${subtree.linesIterator.next()} " +
          s"codeLen=${code.length}")
    }
    spark.stop()
  }
}
