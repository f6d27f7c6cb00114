package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Online near-dup admission: cross-batch rejection against the
  * persistent store, batch-internal smaller-id rule, distinct documents
  * pass, and store increments are idempotent under batch replay. */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val base = ("the quick brown fox jumps over the lazy dog while " +
    "seventeen engineers review a streaming dedup operator for near " +
    "duplicate admission control at corpus scale").split(" ")
  private def doc(changeAt: Int*): String =
    base.zipWithIndex.map { case (w, i) =>
      if (changeAt.contains(i)) w.toUpperCase else w }.mkString(" ")
  private val distinctDoc = "completely different content about xrd " +
    "frame integration masks rings arcs and q bins nothing shared with " +
    "the admission corpus in any shingle of length three at all here"

  test("streamed batches: store rejects cross-batch near-dups, " +
      "smaller-id rule resolves in-batch dups, distinct docs admit") {
    implicit val ctx = spark.sqlContext
    val storeDir = tmp("dedup_store"); val admittedDir = tmp("dedup_adm")
    val ckpt = tmp("dedup_ck")
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.start(spark,
      in.toDF().toDF("doc_id", "text"), "doc_id", "text",
      storeDir, admittedDir, ckpt)
    try {
      // batch 0: two distinct docs + an in-batch near-dup of id 1
      in.addData((1L, doc()), (2L, distinctDoc), (3L, doc(4)))
      q.processAllAvailable()
      // batch 1: near-dup of batch-0's id 1 (store hit), one new doc
      in.addData((10L, doc(7)), (11L, "entirely novel third document " +
        "mentioning catalyst plans exchanges broadcasts and watermarks " +
        "sharing no three word run with either earlier admitted text"))
      q.processAllAvailable()
    } finally q.stop()

    def admitted(batch: Long): Set[Long] =
      spark.read.parquet(s"$admittedDir/batch=$batch")
        .select("doc_id").as[Long].collect().toSet
    assert(admitted(0) == Set(1L, 2L))  // 3 rejected: near-dups 1 in-batch
    assert(admitted(1) == Set(11L))     // 10 rejected: near-dups stored 1
    // the store holds band rows ONLY for admitted docs
    val storeIds = spark.read.parquet(storeDir)
      .select("id").as[Long].collect().toSet
    assert(storeIds == Set(1L, 2L, 11L))
  }

  test("documents shorter than one shingle are ADMITTED, not silently " +
      "dropped; an all-short first batch does not poison the store") {
    val storeDir = tmp("dedup_store3"); val admittedDir = tmp("dedup_adm3")
    // batch 0: only signature-less docs -> fileless store increment
    val short = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    assert(StreamingDedup.processBatch(spark, short, 0L, "doc_id",
      "text", storeDir, admittedDir) == Seq(1L, 2L))
    assert(spark.read.parquet(s"$admittedDir/batch=0")
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    // batch 1 must survive the empty increment AND mix short + long
    val mixed = Seq((10L, "tiny doc"), (11L, doc())).toDF("doc_id", "text")
    assert(StreamingDedup.processBatch(spark, mixed, 1L, "doc_id",
      "text", storeDir, admittedDir) == Seq(10L, 11L))
    // batch 2: near-dup of 11 rejected, short doc still admitted
    val next = Seq((20L, doc(3)), (21L, "another tiny"))
      .toDF("doc_id", "text")
    assert(StreamingDedup.processBatch(spark, next, 2L, "doc_id",
      "text", storeDir, admittedDir) == Seq(21L))
  }

  test("query restart from the checkpoint keeps the store consistent " +
      "and admission decisions stable") {
    implicit val ctx = spark.sqlContext
    val storeDir = tmp("dedup_store4"); val admittedDir = tmp("dedup_adm4")
    val ckpt = tmp("dedup_ck4")
    val in = MemoryStream[(Long, String)]
    def startQuery() = StreamingDedup.start(spark,
      in.toDF().toDF("doc_id", "text"), "doc_id", "text",
      storeDir, admittedDir, ckpt)
    val q1 = startQuery()
    try {
      in.addData((1L, doc()), (2L, distinctDoc))
      q1.processAllAvailable()
    } finally q1.stop()
    val q2 = startQuery()
    try {
      // batch 1 after restart: near-dup of stored 1 rejected, new admits
      in.addData((10L, doc(5)), (11L, "wholly new words about geometry " +
        "caches and executor side sinks unlike anything stored before"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(s"$admittedDir/batch=0")
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    assert(spark.read.parquet(s"$admittedDir/batch=1")
      .select("doc_id").as[Long].collect().toSet == Set(11L))
    assert(spark.read.parquet(storeDir)
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 11L))
  }

  test("replaying a batch overwrites its increment instead of " +
      "double-appending (idempotent store)") {
    val storeDir = tmp("dedup_store2"); val admittedDir = tmp("dedup_adm2")
    val b = Seq((1L, doc()), (2L, distinctDoc)).toDF("doc_id", "text")
    val first = StreamingDedup.processBatch(spark, b, 0L, "doc_id",
      "text", storeDir, admittedDir)
    val rowsAfterFirst = spark.read.parquet(storeDir).count()
    val replay = StreamingDedup.processBatch(spark, b, 0L, "doc_id",
      "text", storeDir, admittedDir)
    assert(first == Seq(1L, 2L) && replay == first)
    assert(spark.read.parquet(storeDir).count() == rowsAfterFirst)
  }
}
