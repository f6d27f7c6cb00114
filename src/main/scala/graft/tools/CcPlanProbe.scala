package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Does the checkpointed partitioning actually elide the per-iteration
  * exchanges in connectedGroups' minStep shape? (dev probe) */
object CcPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val pairs = (1L to 2000L).map(i => (i, i + 1)).toDF("u", "v")
    val half = pairs.select(col("u"), col("v"))
    val edges = half.unionByName(half.select(col("v").as("u"), col("u").as("v")))
      .where(col("u") =!= col("v")).distinct()
      .repartition(col("v"))
      .localCheckpoint(eager = true)
    println("edges ckpt outputPartitioning: " +
      edges.queryExecution.executedPlan.outputPartitioning)
    val labels = edges.select(col("u").as("id")).distinct()
      .withColumn("group_id", col("id"))
      .repartition(col("id"))
      .localCheckpoint(eager = true)
    println("labels ckpt outputPartitioning: " +
      labels.queryExecution.executedPlan.outputPartitioning)
    val cur = labels.select(col("id"), col("group_id"))
    val nbrMin = edges
      .join(cur.select(col("id").as("v"), col("group_id").as("_nl")), "v")
      .groupBy(col("u")).agg(min(col("_nl")).as("_nmin"))
      .withColumnRenamed("u", "id")
    val m = cur.select(col("id"), col("group_id").as("_old"))
      .join(nbrMin, Seq("id"), "left")
      .select(col("id"), col("_old"),
        least(col("_old"), coalesce(col("_nmin"), col("_old"))).as("group_id"))
    val step = m.join(m.select(col("id").as("group_id"),
        col("group_id").as("_jump")), Seq("group_id"), "left")
      .select(col("id"),
        least(col("group_id"), coalesce(col("_jump"), col("group_id")))
          .as("group_id"))
    step.explain("formatted")
    spark.stop()
  }
}
