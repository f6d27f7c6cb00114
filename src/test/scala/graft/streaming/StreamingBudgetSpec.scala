package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.ops.Sampling

/** Streaming token-budget admission: arrival-order prefix semantics,
  * boundary-document inclusion, cross-batch state carry, rejection of
  * unbudgeted strata and non-positive tokens, in-batch order
  * determinism, and PARITY with the batch tokenBudgetSampleByStratum
  * walk when arrival order is priority order. */
class StreamingBudgetSpec extends SparkSpec {
  import spark.implicits._

  test("prefix admission with boundary doc kept; state carries across " +
      "batches; unknown stratum and non-positive tokens rejected") {
    val dir = Files.createTempDirectory("bud_in").toString
    val ckpt = Files.createTempDirectory("bud_ck").toString
    val schema = StructType(Seq(StructField("stratum", StringType),
      StructField("order_id", LongType), StructField("tokens", LongType)))
    // en budget 100: 40 + 50 = 90 < 100 -> the 30-token boundary doc is
    // ADMITTED (crossing), the next rejected; fr: no budget
    Files.writeString(Paths.get(dir, "b0.jsonl"), Seq(
      """{"stratum": "en", "order_id": 1, "tokens": 40}""",
      """{"stratum": "en", "order_id": 2, "tokens": 50}""",
      """{"stratum": "fr", "order_id": 3, "tokens": 10}""",
      """{"stratum": "en", "order_id": 4, "tokens": 0}""",
      """{"stratum": "en", "order_id": 7}""").mkString("\n"))

    val lines = spark.readStream.schema(schema).json(dir)
    val decisions = StreamingBudget.admit(lines, col("stratum"),
      col("order_id"), col("tokens"), Seq("en" -> 100L))
    val q = decisions.writeStream
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("bud_out").outputMode("update")
      .start()
    try {
      q.processAllAvailable()
      // batch 1: the boundary doc (crosses 100) then a post-budget doc
      Files.writeString(Paths.get(dir, "b1.jsonl"), Seq(
        """{"stratum": "en", "order_id": 5, "tokens": 30}""",
        """{"stratum": "en", "order_id": 6, "tokens": 5}""").mkString("\n"))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.sql("select * from bud_out")
      .collect().map(r => (r.getLong(1), r.getBoolean(3), r.getLong(4),
        r.getString(5)))
      .sortBy(_._1)
    val byId = rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(byId(1L) == ((true, 40L, "admitted")))
    assert(byId(2L) == ((true, 90L, "admitted")))
    assert(byId(3L) == ((false, 0L, "no_budget"))) // no fr budget
    assert(byId(4L)._3 == "invalid_row") // non-positive tokens
    // the tokens-field-less row flows through observably, never crashes
    assert(byId(7L)._3 == "invalid_row")
    assert(byId(5L) == ((true, 120L, "admitted"))) // boundary kept (90<100)
    assert(byId(6L) == ((false, 120L, "budget_exhausted")))
  }

  test("in-batch admission is order_id-deterministic, and equals the " +
      "batch walk when arrival order is priority order") {
    // one batch, shuffled input rows: the walk must follow order_id
    val docs = Seq(
      ("en", 3L, 30L), ("en", 1L, 50L), ("en", 2L, 40L),
      ("de", 1L, 25L), ("de", 2L, 10L))
    val streamed = {
      // drive the update function directly (the factored seam)
      val it = StreamingBudget.update(Map("en" -> 100L, "de" -> 30L))(
        "en",
        docs.filter(_._1 == "en")
          .map(d => StreamingBudget.Doc(d._1, d._2, d._3, valid = true)).iterator,
        new FakeGroupState[Long])
      it.toSeq.map(d => d.order_id -> d.admitted).toMap
    }
    // order_id walk: 1 (50) admit, 2 (40) admit (90<100), 3 (30) admit
    // (the boundary doc crosses) -> all three admitted
    assert(streamed == Map(1L -> true, 2L -> true, 3L -> true))

    // batch parity: priority DESCENDING == arrival order when
    // priority_i = 1 - order_i/N; the batch walk keeps the same set
    val df = docs.toDF("stratum", "order_id", "tokens")
      .withColumn("prio", lit(1.0) - col("order_id") / lit(10.0))
    val batch = Sampling.tokenBudgetSampleByStratum(df, col("stratum"),
        col("order_id"), col("prio"), col("tokens"),
        Seq("en" -> 100L, "de" -> 30L))
      .select(col("stratum"), col("order_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val onlineAll = Seq("en", "de").flatMap { s =>
      StreamingBudget.update(Map("en" -> 100L, "de" -> 30L))(
        s,
        docs.filter(_._1 == s)
          .map(d => StreamingBudget.Doc(d._1, d._2, d._3, valid = true)).iterator,
        new FakeGroupState[Long]).toSeq
    }.filter(_.admitted).map(d => (d.stratum, d.order_id)).toSet
    assert(onlineAll == batch,
      s"online $onlineAll diverged from batch $batch")
  }

  test("unbudgeted strata pin NO state (state bounded by configuration, " +
      "not by data-derived stratum values)") {
    val st = new FakeGroupState[Long]
    val out = StreamingBudget.update(Map("en" -> 100L))(
      "garbage-stratum-937",
      Iterator(StreamingBudget.Doc("garbage-stratum-937", 1L, 10L,
        valid = true)),
      st).toSeq
    assert(out.map(_.reason) == Seq("no_budget"))
    assert(!st.exists,
      "an unbudgeted stratum must not leave a GroupState entry behind")
    // ...and a budgeted one does
    val st2 = new FakeGroupState[Long]
    StreamingBudget.update(Map("en" -> 100L))(
      "en", Iterator(StreamingBudget.Doc("en", 1L, 10L, valid = true)),
      st2).toSeq
    assert(st2.getOption.contains(10L))
  }

  test("NULL stratum never admits against a configured \"\" budget, and " +
      "surfaces as null in decisions") {
    val dir = Files.createTempDirectory("bud_null_in").toString
    val ckpt = Files.createTempDirectory("bud_null_ck").toString
    val schema = StructType(Seq(StructField("stratum", StringType),
      StructField("order_id", LongType), StructField("tokens", LongType)))
    Files.writeString(Paths.get(dir, "b0.jsonl"), Seq(
      """{"order_id": 1, "tokens": 10}""", // NULL stratum
      """{"stratum": "", "order_id": 2, "tokens": 10}""").mkString("\n"))
    val lines = spark.readStream.schema(schema).json(dir)
    val decisions = StreamingBudget.admit(lines, col("stratum"),
      col("order_id"), col("tokens"), Seq("" -> 100L))
    val q = decisions.writeStream
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("bud_null_out").outputMode("update")
      .start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.sql("select * from bud_null_out").collect()
      .map(r => (r.getLong(1),
        (if (r.isNullAt(0)) null else r.getString(0), r.getString(5))))
      .toMap
    assert(rows(1L) == ((null, "no_budget"))) // NULL stays unbudgetable
    assert(rows(2L) == (("", "admitted"))) // "" budget serves only ""
  }
}
