package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.ops.{Dedup, Sketches}

/** Cross-batch == batch parity for the COMPOSED streaming curation
  * pipeline ([[StreamingCuration]]): after N micro-batches,
  *
  *  - the merged funnel counters equal the batch funnel over the union
  *    of all parsed inputs (sums commute across batch boundaries);
  *  - the quarantine volume equals the batch contract parse's;
  *  - the admitted set equals the BATCH near-dedup (LSH candidates →
  *    connected components → min-id canonical) over the union — exact
  *    on chain-free data, the documented equivalence domain;
  *  - the merged per-column profile equals the batch computation over
  *    the admitted union: scalars exactly, approx_distinct ==
  *    the batch HLL register sketch bit-for-bit.
  */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("lang", StringType),
    StructField("text", StringType)))

  private def jline(id: Long, lang: String, text: String): String =
    s"""{"doc_id": $id, "lang": "$lang", "text": "$text"}"""

  /** ~55 distinct alphabetic words incl. >= 2 Gopher stopwords, mean
    * length inside [3, 10] — passes every Gopher rule, and `salt`
    * makes documents mutually non-near-dup. */
  private def prose(salt: String): String = {
    val uniq = (1 to 46).map(i => s"$salt${('a' + i % 26).toChar}word$i")
    (Seq("the", "data", "that", "we", "have", "with", "good", "works",
      "fine") ++ uniq).mkString(" ")
  }

  test("composed stream == batch stages over the union, across batches") {
    val dir = java.nio.file.Files.createTempDirectory("curc_in").toString
    val out = java.nio.file.Files.createTempDirectory("curc_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("curc_ck").toString
    val cfg = StreamingCuration.Config()

    val d10 = prose("ax"); val d11 = prose("by"); val d20 = prose("cz")
    // near-dup of d10: one word mutated out of ~55
    val d21 = d10.replace("axkword10", "mutatedone")
    val b0 = Seq(
      jline(10, "en", d10),
      jline(11, "en", d11),
      """{"doc_id": 12, "lang": "en", "text": "trunca""", // quarantined
      jline(13, "en", "too few words here"), // fails words_in_range
      jline(14, "en", Seq.fill(60)("spam").mkString(" "))) // repetition
    val b1 = Seq(
      jline(20, "fr", d20),
      jline(21, "en", d21), // cross-batch near-dup of 10 -> rejected
      "not json at all") // quarantined
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "b0.jsonl"), b0.mkString("\n"))

    val lines = spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(dir)
    val q = StreamingCuration.start(spark, lines, schema, "doc_id",
      "text", out, ckpt, cfg)
    try {
      q.processAllAvailable()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "b1.jsonl"), b1.mkString("\n"))
      q.processAllAvailable()
    } finally q.stop()

    // ---- batch legs over the UNION of all input lines ----------------
    val allLines = (b0 ++ b1).toDF("raw")
    val (clean, quar) =
      graft.sources.JsonlSource.parseWithQuarantine(allLines, schema)

    // funnel parity: merged counters == the batch funnel (same rule set)
    val streamFunnel = StreamingCuration.funnelTotals(spark, out)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val batchFunnel = StreamingFunnel.funnel(clean, col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(streamFunnel == batchFunnel,
      s"funnel diverged:\n stream $streamFunnel\n batch  $batchFunnel")
    // 6 parsed docs; all_rules fails: 13 (too few words), 14 (no
    // stopwords + repetition); the near-dup 21 PASSES quality (it is
    // dropped later, at admission)
    assert(streamFunnel.exists { case (r, f, n) =>
      r == "all_rules" && f == 2L && n == 6L },
      s"expected known funnel counts, got $streamFunnel")

    // quarantine parity
    val streamQuar = spark.read.parquet(s"$out/quarantine")
    assert(streamQuar.count() == quar.count() && quar.count() == 2L)

    // admission parity vs the BATCH near-dedup canonical (chain-free)
    val rules = StreamingFunnel.rulesOver(col("__qf_g"), col("__qf_r"),
      cfg.minWords, cfg.maxWords, cfg.ngramMax)
    val quality = StreamingFunnel.withFeatures(clean, col("text"),
        cfg.minWords, cfg.maxWords, cfg.stopwords)
      .where(rules.last._2).drop("__qf_g", "__qf_r")
    val sigs = Dedup.minhashSignatures(quality, "doc_id", "text",
      cfg.shingleN, cfg.sigK).localCheckpoint(true)
    val pairs = Dedup.candidatePairsFromSigs(sigs, cfg.sigK, cfg.bands)
      .where(col("agree") >= cfg.minAgree)
    val losers = Dedup.connectedGroups(pairs, "id_a", "id_b")
      .where(col("id") =!= col("group_id")) // canonical = min reachable id
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val batchAdmitted = quality.select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet -- losers
    val streamAdmitted = spark.read.parquet(s"$out/admitted")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(streamAdmitted == batchAdmitted,
      s"admission diverged: stream $streamAdmitted batch $batchAdmitted")
    assert(streamAdmitted == Set(10L, 11L, 20L), s"got $streamAdmitted")

    // profile parity over the admitted union: scalars exact,
    // approx_distinct == the batch register sketch bit-for-bit
    val admUnion = spark.read.parquet(s"$out/admitted")
      .select(col("doc_id"), col("lang"), col("text"))
    val merged = StreamingCuration.mergedProfile(spark, out, cfg.hllP)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)),
          r.getDouble(4))).toMap
    for (c <- Seq("doc_id", "lang", "text")) {
      val vals = admUnion.select(col(c)).where(col(c).isNotNull)
      assert(merged(c)._1 == vals.count(), s"n_nonnull($c)")
      val batchRegs = Sketches.hllRegisters(vals, col(c).cast("string"),
          cfg.hllP)
        .collect().map(r => (r.getInt(0), r.getInt(1)))
      val regs = new Array[Byte](1 << cfg.hllP)
      batchRegs.foreach { case (b, rk) =>
        if (rk > regs(b)) regs(b) = rk.toByte }
      val est = StreamingDistinct.estimateOf(regs, cfg.hllP)
      assert(java.lang.Double.compare(merged(c)._4, est) == 0,
        s"approx_distinct($c): ${merged(c)._4} vs $est")
    }
    // numeric min/max on the one numeric column
    assert(merged("doc_id")._2.contains(10.0) &&
      merged("doc_id")._3.contains(20.0), s"${merged("doc_id")}")
  }

  test("a replayed micro-batch rewrites its increments instead of " +
      "double-counting (funnel, quarantine, admitted, profile)") {
    val out = java.nio.file.Files.createTempDirectory("curr_out").toString
    val cfg = StreamingCuration.Config()
    val b0 = Seq(jline(10, "en", prose("rp")),
      """{"doc_id": 11, "lang": "en", "text": "trunc""",
      jline(12, "en", "short")).toDF("raw")
    val b1 = Seq(jline(20, "en", prose("rq"))).toDF("raw")

    def snapshot(): (Set[(String, Long, Long)], Long, Set[Long],
                     Seq[(String, Long, Double)]) = (
      StreamingCuration.funnelTotals(spark, out).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet,
      spark.read.parquet(s"$out/quarantine").count(),
      spark.read.parquet(s"$out/admitted")
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet,
      StreamingCuration.mergedProfile(spark, out, cfg.hllP).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(4)))
        .sortBy(_._1).toSeq)

    StreamingCuration.processBatch(spark, b0, 0L, schema, "doc_id",
      "text", out, cfg)
    StreamingCuration.processBatch(spark, b1, 1L, schema, "doc_id",
      "text", out, cfg)
    val before = snapshot()
    // the post-crash scenario: batch 0 replays AFTER batch 1 committed
    StreamingCuration.processBatch(spark, b0, 0L, schema, "doc_id",
      "text", out, cfg)
    assert(snapshot() == before,
      "replaying batch 0 must leave every merged output unchanged")
    assert(before._3 == Set(10L, 20L))
  }

  test("merged outputs are batch-boundary-invariant on chain-free " +
      "input: one batch == two batches") {
    val cfg = StreamingCuration.Config()
    val l1 = jline(10, "en", prose("bv"))
    val l2 = jline(11, "en", prose("bw"))
    val l3 = jline(20, "en", prose("bv").replace("bvkword10", "varied"))
    val l4 = """broken json"""
    // near-dup pair (10, 20) with the duplicate's id larger and no
    // chains: the canonical min-id winner is boundary-independent
    def run(splits: Seq[Seq[String]]): (Set[(String, Long, Long)],
                                        Long, Set[Long],
                                        Seq[(String, Long, Double)]) = {
      val out = java.nio.file.Files.createTempDirectory("bvar").toString
      splits.zipWithIndex.foreach { case (lines, i) =>
        StreamingCuration.processBatch(spark, lines.toDF("raw"), i.toLong,
          schema, "doc_id", "text", out, cfg)
      }
      (StreamingCuration.funnelTotals(spark, out).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet,
        spark.read.parquet(s"$out/quarantine").count(),
        spark.read.parquet(s"$out/admitted")
          .select(col("doc_id")).collect().map(_.getLong(0)).toSet,
        StreamingCuration.mergedProfile(spark, out, cfg.hllP).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(4)))
          .sortBy(_._1).toSeq)
    }
    val one = run(Seq(Seq(l1, l2, l3, l4)))
    val two = run(Seq(Seq(l1, l2), Seq(l3, l4)))
    assert(one == two,
      s"boundary split changed the merged outputs:\n one $one\n two $two")
    assert(one._3 == Set(10L, 11L))
  }

  // ---- the budget-capped pipeline (stage 3.5) -------------------------

  /** Five quality-passing, mutually non-dup docs: four en, one fr. */
  private def budgetLines: Seq[String] = Seq(
    jline(10, "en", prose("ba")), jline(11, "en", prose("bb")),
    jline(12, "en", prose("bc")), jline(13, "en", prose("bd")),
    jline(14, "fr", prose("be")))

  private def budgetCfg = StreamingCuration.Config(
    budgets = Seq("en" -> 120L), budgetStratum = "lang")

  private def budgetSnapshot(out: String): (Set[Long], Map[Long, String],
                                            Long, Long) = {
    val dec = spark.read.parquet(s"$out/budget")
    (dec.where(col("admitted")).select(col("order_id"))
       .collect().map(_.getLong(0)).toSet,
     dec.collect().map(r => r.getLong(1) -> r.getString(5)).toMap,
     spark.read.parquet(s"$out/budget_state")
       .agg(sum(col("tokens"))).collect()(0).getLong(0),
     StreamingCuration.mergedProfile(spark, out, budgetCfg.hllP)
       .where(col("col_name") === "doc_id").collect()(0).getLong(1))
  }

  test("budget stage: arrival-order prefix admission carries across " +
      "batches, boundary doc kept, unbudgeted stratum rejected, and " +
      "the profile watches the post-budget survivors") {
    // each prose doc is 55 tokens; en budget 120: 55 -> 110 -> 165
    // (boundary doc 12 CROSSES and is kept), 13 exhausted; fr: no
    // budget. Same walk whatever the batch split.
    val outs = scala.collection.mutable.Buffer.empty[String]
    def runT(splits: Seq[Seq[String]]) = {
      val out = java.nio.file.Files.createTempDirectory("bgt").toString
      outs += out
      splits.zipWithIndex.foreach { case (lines, i) =>
        StreamingCuration.processBatch(spark, lines.toDF("raw"), i.toLong,
          schema, "doc_id", "text", out, budgetCfg)
      }
      budgetSnapshot(out)
    }
    val one = runT(Seq(budgetLines))
    val two = runT(Seq(budgetLines.take(2), budgetLines.drop(2)))
    val three = runT(Seq(budgetLines.take(1), budgetLines.slice(1, 4),
      budgetLines.drop(4)))
    assert(one == two && two == three,
      s"batch split changed the budget outcome:\n $one\n $two\n $three")
    val (admitted, reasons, stateTotal, profiled) = one
    assert(admitted == Set(10L, 11L, 12L), s"admitted $admitted")
    assert(reasons(12L) == "admitted" && reasons(13L) == "budget_exhausted"
      && reasons(14L) == "no_budget", s"reasons $reasons")
    assert(stateTotal == 165L, s"state total $stateTotal")
    assert(profiled == 3L, s"profile must watch survivors, saw $profiled")
    // curated/ is the FINAL corpus output: exactly the budget survivors
    // (admitted/ still carries the pre-budget doc 13 — the stage-3
    // artifact, not the corpus a consumer should ship)
    for (out <- outs) {
      val curated = spark.read.parquet(s"$out/curated")
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(curated == Set(10L, 11L, 12L), s"curated $curated in $out")
      val preBudget = spark.read.parquet(s"$out/admitted")
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(preBudget.contains(13L),
        "stage-3 admitted/ should still hold the budget-rejected doc")
    }

    // ...and the outcome equals the GroupState transport's walk over
    // the union (one rule implementation, two transports)
    val docs = Seq((10L, 55L), (11L, 55L), (12L, 55L), (13L, 55L))
      .map { case (id, tk) => StreamingBudget.Doc("en", id, tk, true) }
    val (decs, total) = StreamingBudget.walk(Some(120L), 0L, "en", docs)
    assert(decs.filter(_.admitted).map(_.order_id).toSet == admitted)
    assert(total == 165L)
  }

  test("budget stage replay: a re-run batch rewrites its state " +
      "increment and decisions instead of double-counting the carry") {
    val out = java.nio.file.Files.createTempDirectory("bgtr").toString
    val (b0, b1) = (budgetLines.take(2), budgetLines.drop(2))
    StreamingCuration.processBatch(spark, b0.toDF("raw"), 0L, schema,
      "doc_id", "text", out, budgetCfg)
    StreamingCuration.processBatch(spark, b1.toDF("raw"), 1L, schema,
      "doc_id", "text", out, budgetCfg)
    val before = budgetSnapshot(out)
    // post-crash: batch 0 replays after batch 1 committed — its own
    // earlier increment must not inflate the carry it replays against
    StreamingCuration.processBatch(spark, b0.toDF("raw"), 0L, schema,
      "doc_id", "text", out, budgetCfg)
    assert(budgetSnapshot(out) == before,
      "replaying batch 0 must leave the budget ledger unchanged")
    assert(before._1 == Set(10L, 11L, 12L))
  }

  test("NB stage: learned keep-filter between rules and dedup, " +
      "batch-boundary invariant, per-class counts persisted") {
    // weak-label a training corpus exactly like the batch composition
    // spec (NaiveBayesSpec), then run the budget-free pipeline with the
    // model configured: docs whose text leans 'drop'-ish vocabulary
    // must be cut AFTER passing the structural rules
    // class marker words must be IN the training vocabulary when the
    // eval docs arrive (everything else in prose() is salt-unique, so
    // OOV at scoring — NB drops it): keep docs carry 'cleanword',
    // spam docs 'buybuy', at alternating positions (trigrams stay
    // distinct, so the repetition rule still passes and the cut is
    // genuinely the MODEL's, not a heuristic's)
    def doc(salt: String, spammy: Boolean): String = {
      val marker = if (spammy) "buybuy" else "cleanword"
      prose(salt).split(" ").zipWithIndex.map { case (w, i) =>
        if (i >= 9 && i <= 29 && i % 2 == 1) marker else w }.mkString(" ")
    }
    import graft.ops.NaiveBayes
    val trainDocs = (0 until 40).map { i =>
      val spammy = i % 2 == 1
      (i.toLong, doc(s"t$i", spammy), if (spammy) "drop" else "keep")
    }.toDF("doc_id", "text", "label")
    val model = NaiveBayes.train(trainDocs, "text", "label")
    val cfg = StreamingCuration.Config(nbModel = Some(model))

    val lines = Seq(
      jline(10, "en", doc("qa", spammy = false)),
      jline(11, "en", doc("qb", spammy = true)), // rules pass, NB cuts
      jline(12, "en", doc("qc", spammy = false)),
      jline(13, "en", "too few words")) // rules cut before NB
    def run(splits: Seq[Seq[String]]) = {
      val out = java.nio.file.Files.createTempDirectory("nbst").toString
      splits.zipWithIndex.foreach { case (ls, i) =>
        StreamingCuration.processBatch(spark, ls.toDF("raw"), i.toLong,
          schema, "doc_id", "text", out, cfg)
      }
      (spark.read.parquet(s"$out/admitted").select(col("doc_id"))
         .collect().map(_.getLong(0)).toSet,
       spark.read.parquet(s"$out/nbfunnel")
         .groupBy(col("predicted")).agg(sum(col("n")).as("n"))
         .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    }
    val one = run(Seq(lines))
    val two = run(Seq(lines.take(2), lines.drop(2)))
    assert(one == two, s"NB stage boundary-variant: $one vs $two")
    val (admitted, counts) = one
    assert(admitted == Set(10L, 12L), s"admitted $admitted")
    // 3 rule-surviving docs scored: 2 keep, 1 drop; the rules-cut doc
    // 13 never reaches the model
    assert(counts == Map("keep" -> 2L, "drop" -> 1L), s"counts $counts")
  }

  test("budget stage replay reads PRIOR batches only: a later batch's " +
      "increment must not flip a replayed batch's original decisions") {
    // prefix admission is order-sensitive: with a 150-token doc in
    // batch 1, a carry that (wrongly) summed ALL other batches would
    // read 150 >= the remaining headroom and rewrite batch 0's second
    // doc as budget_exhausted — rewriting history for a document
    // already emitted downstream. The carry must be Σ(batch < id).
    val big = (Seq("the", "data", "that", "we", "have", "with", "good",
      "works", "fine") ++ (1 to 141).map(i =>
        s"bz${('a' + i % 26).toChar}word$i")).mkString(" ") // 150 tokens
    val cfg = StreamingCuration.Config(
      budgets = Seq("en" -> 170L), budgetStratum = "lang")
    val out = java.nio.file.Files.createTempDirectory("bgtp").toString
    val b0 = Seq(jline(10, "en", prose("pa")), jline(11, "en", prose("pb")))
    val b1 = Seq(jline(20, "en", big))
    StreamingCuration.processBatch(spark, b0.toDF("raw"), 0L, schema,
      "doc_id", "text", out, cfg)
    StreamingCuration.processBatch(spark, b1.toDF("raw"), 1L, schema,
      "doc_id", "text", out, cfg)
    // walk: 10 (0<170, ->55), 11 (55<170, ->110), then 20 crosses the
    // boundary (110<170, ->260)
    val before = budgetSnapshot(out)
    assert(before._1 == Set(10L, 11L, 20L), s"got ${before._1}")
    StreamingCuration.processBatch(spark, b0.toDF("raw"), 0L, schema,
      "doc_id", "text", out, cfg)
    val after = budgetSnapshot(out)
    assert(after == before,
      s"replay flipped decisions under a future-batch carry:\n" +
        s" before $before\n after  $after")
  }
}
