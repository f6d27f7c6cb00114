package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** How many times does the PqEncodeSig kernel appear in the Lloyd
  * recentroid pass's physical plan? (the generate-duplication
  * question — dev probe) */
object TrainPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.graftshim.Internals.{column => toCol, expression => toExpr}
    import graft.queries.PqStage
    val e = PqStage.embeddings(spark, sfDir)
    val sd = PqStage.Dim / PqStage.Sub
    val cbv = Vector.tabulate(PqStage.Sub)(s =>
      Vector.tabulate(PqStage.K)(c =>
        Vector.tabulate(sd)(d => (s * 31 + c * 7 + d).toDouble)))
    val assigned = e.select(col("vec_id").as("id"), col("v").as("__pq_v"))
      .select(col("id"), col("__pq_v"),
        posexplode(toCol(graft.functions.PqEncodeSig(
          toExpr(col("__pq_v")), cbv))).as(Seq("sub", "code")))
      .select(col("id"), col("sub"), col("code"),
        slice(col("__pq_v"), col("sub") * sd + 1, lit(sd)).as("sv"))
    val rec = assigned
      .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("i", "x")))
      .groupBy(col("sub"), col("code"), col("i"))
      .agg((sum(col("x").cast("decimal(18,9)")).cast("double") /
        count(lit(1))).as("c"))
    val plan = rec.queryExecution.executedPlan.toString
    val n = "pq_encode_sig".r.findAllIn(plan.toLowerCase).length
    println(s"PQENCODESIG occurrences in physical plan: $n")
    println(plan.split("\n").filter(l => l.toLowerCase.contains("pq_encode_sig") || l.contains("Generate") || l.contains("Filter"))
      .take(6).mkString("\n"))
    spark.stop()
  }
}
