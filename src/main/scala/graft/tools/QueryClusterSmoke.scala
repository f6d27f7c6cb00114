package graft.tools

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession

/** Multi-executor validation for the ORACLE QUERY surface (the frame
  * pipeline's ClusterSmoke counterpart): runs a set of oracle queries on
  * a `local-cluster[n, cores, mem]` master — real separate executor
  * JVMs — and prints one deterministic fingerprint per query (md5 over
  * the ordered collected rows; every query ends with a total ORDER BY)
  * plus the executor spread of multi-task stages. Run once with execs=0
  * (plain local[]) and once clustered; identical fingerprints = the
  * curation/relational operators distribute correctly across process
  * boundaries.
  *
  *   sbt "runMain graft.tools.QueryClusterSmoke [execs] [coresPer] [memMb] [sfDir] [names...]"
  */
object QueryClusterSmoke {
  def main(args: Array[String]): Unit = {
    val execs = if (args.length > 0) args(0).toInt else 2
    val coresPer = if (args.length > 1) args(1).toInt else 8
    val memMb = if (args.length > 2) args(2).toInt else 4096
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val names = if (args.length > 4) args.drop(4).toSeq else Seq(
      "events_sessionize", "j8_asof", "j9_range_join", "text_topk_terms",
      "text_tfidf", "sample_stratified", "sample_topn", "dedup_canonical",
      "decontaminate", "dedup_groups", "text_winnow", "skew_salted_agg",
      "j10_bloom_join", "sketch_cms_heavy", "sketch_hll_distinct",
      "text_repetition", "text_redact", "sample_weighted",
      "cluster_kmeans", "text_tokens", "text_unigram_logprob")

    val master = if (execs <= 0) "local[16]"
      else s"local-cluster[$execs,$coresPer,$memMb]"
    val b = SparkSession.builder().master(master)
      .appName("graft-query-cluster-smoke")
      .config("spark.sql.shuffle.partitions",
        math.max(8, execs * coresPer).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "1200s")
    val spark = (if (execs <= 0) b
      else LocalClusterConf.executorConf(b, s"${memMb - 512}m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stageExecs = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.concurrent.ConcurrentLinkedQueue[String]]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          stageExecs.computeIfAbsent(e.stageId,
            _ => new java.util.concurrent.ConcurrentLinkedQueue[String]())
            .add(e.taskInfo.executorId)
      })

    names.foreach { name =>
      val t0 = System.nanoTime()
      val rows = graft.SparkEntry.queries(name)(spark, sfDir).collect()
      val digest = MessageDigest.getInstance("MD5")
      rows.foreach(r => digest.update(r.toString.getBytes("UTF-8")))
      val fp = digest.digest().map("%02x".format(_)).mkString.take(16)
      println(f"[qsmoke] $name%-22s rows=${rows.length}%-7d fp=$fp " +
        f"${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }

    import scala.jdk.CollectionConverters._
    val spreads = stageExecs.asScala.toSeq.map { case (_, q) =>
      val tasks = q.asScala.toSeq
      (tasks.length, tasks.distinct.length)
    }
    val multi = spreads.filter(_._1 > 1)
    println(s"[qsmoke] stages=${spreads.length} multiTask=${multi.length} " +
      s"multiTaskOnOneExecutor=${multi.count(_._2 == 1)}")
    spark.stop()
  }
}
