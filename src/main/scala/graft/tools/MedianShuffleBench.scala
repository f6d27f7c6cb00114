package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.RobustStats

/** Interleaved A/B (dev tool): the shipped `medianMadOnePass` plan
  * (partial ObjectHashAggregate → exchange of kryo'd value buffers →
  * final) vs the PRE-PARTITIONED form (repartition plain Tungsten rows
  * on the keys first, so the aggregate plans single-stage Complete and
  * the per-group Array[Double] buffers never serialize). Same operator,
  * same results — the question is purely which side of the exchange the
  * buffering happens on. QbinBench (r7, deleted with its loser) answered
  * agg-vs-sorted; this answers agg-vs-prepartitioned-agg.
  *
  *   sbt "runMain graft.tools.MedianShuffleBench [rows] [groups] [pairs]"
  */
object MedianShuffleBench {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 33000000L
    val groups = if (args.length > 1) args(1).toInt else 2000
    val pairs = if (args.length > 2) args(2).toInt else 3
    require(groups >= 4 && groups % 4 == 0,
      s"groups must be a positive multiple of 4 (got $groups): q_bin is " +
        "derived as (id/4) % (groups/4), so other values silently " +
        "benchmark a different group count than printed")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic synthetic q-bin table shaped like the A8 input:
    // (frame_no, q_bin, g) with frame x bin groups of ~rows/groups values
    val df = spark.range(rows).select(
        (col("id") % 4).cast("int").as("frame_no"),
        ((col("id") / 4) % (groups / 4)).cast("int").as("q_bin"),
        (sin(col("id").cast("double")) * 1000.0).as("g"))
      .localCheckpoint(true)
    println(s"[medshuf] rows = ${df.count()}, groups = $groups")

    def run(prepart: Boolean): (Double, String) = {
      val in = if (prepart)
        df.repartition(32, col("frame_no"), col("q_bin")) else df
      val t0 = System.nanoTime()
      val out = RobustStats.medianMadOnePass(in,
          Seq("frame_no", "q_bin"), "g")
        .orderBy("frame_no", "q_bin").collect()
      val secs = (System.nanoTime() - t0) / 1e9
      val fp = out.map(_.toSeq.map {
        case d: Double => f"$d%.9e"
        case v => String.valueOf(v)
      }.mkString(",")).mkString("|").hashCode.toHexString
      (secs, fp)
    }

    var ra = List.empty[Double]; var rb = List.empty[Double]
    for (i <- 1 to pairs) {
      val (ta, fa) = run(prepart = false)
      val (tb, fb) = run(prepart = true)
      require(fa == fb, s"A/B mismatch: $fa vs $fb")
      println(f"[medshuf] pair $i: agg $ta%7.2f s  prepart $tb%7.2f s  " +
        f"ratio ${ta / tb}%5.2fx  (fp $fa)")
      ra ::= ta; rb ::= tb
    }
    val geo = math.exp(
      ra.zip(rb).map { case (a, b) => math.log(a / b) }.sum / pairs)
    println(f"[medshuf] geomean agg/prepart = $geo%5.2fx over $pairs pairs")
    spark.stop()
  }
}
