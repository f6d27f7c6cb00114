package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.UrlOps

/** The |rules|-scaling curve behind the r13 PSL decision: the
  * generated-expression registrable-domain match (one probe fan per
  * rule, linear tree growth) vs the trie-compiled expression (one
  * node, O(host labels) per row) as the rule count walks from the
  * committed fixture's size to the full public list's ~9.5k.
  *
  * Per point, both costs the VERDICT asked for, separated:
  *  - plan_s: analysis + optimization + physical planning + codegen
  *    (forcing executedPlan and one zero-row execution over an EMPTY
  *    relation of the same schema — pure plan-side cost, no data);
  *  - exec_s: wall for one noop-write execution over the documents
  *    table of SPARK_GRAFT_SF_DIR (per-row cost under the real scan).
  * A point that exceeds the per-point budget (default 180 s, env
  * SPARK_GRAFT_PSL_BUDGET_S) stops the generated-form escalation —
  * the cliff IS the finding; the trie runs at full count regardless.
  *
  * runMain graft.tools.PslScaleProbe [sizes...]
  * (default sizes: fixture, 500, 1000, 2000, 4000, full) */
object PslScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val budgetS =
      sys.env.getOrElse("SPARK_GRAFT_PSL_BUDGET_S", "180").toDouble
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-pslscale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val full = UrlOps.PslFull
    // every gen point is a PREFIX of the full list (full.take(n)) —
    // the fixture-SIZED first point is NOT the committed fixture's
    // hand-picked rule mix, just the list's first rules; label curve
    // rows accordingly
    val sizes: Seq[Int] =
      if (args.length == 1 && args(0) == "trie-only") Nil
      else if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(UrlOps.PslFixture.size, 500, 1000, 2000, 4000, full.size)

    // SPARK_GRAFT_PSL_SYNTH=N swaps the documents scan for an N-row
    // range source with hosts cycling through suffix classes (plain
    // 2-level, co.uk, blogspot, wildcard-fed kawasaki.jp, unlisted) —
    // the production-volume throughput leg: per-row cost over
    // millions of rows instead of the sf tables' thousands, scan and
    // codegen shapes identical to the real path.
    val docs = sys.env.get("SPARK_GRAFT_PSL_SYNTH") match {
      case Some(n) =>
        val id = col("id").cast("string")
        // SPARK_GRAFT_PSL_IDN=1 adds a 2/7 IDN share (one unicode,
        // one punycode spelling) — the r14 canonicalization leg's
        // worst-realistic case; default keeps the r13 5-class mix so
        // the recorded curves stay comparable
        val suffixes =
          if (sys.env.get("SPARK_GRAFT_PSL_IDN").contains("1"))
            array(lit(".example.com"), lit(".example.co.uk"),
              lit(".blogspot.com"), lit(".x.kawasaki.jp"),
              lit(".unlisted"), lit(".公司.cn"), lit(".xn--55qx5d.cn"))
          else
            array(lit(".example.com"), lit(".example.co.uk"),
              lit(".blogspot.com"), lit(".x.kawasaki.jp"),
              lit(".unlisted"))
        val k = if (sys.env.get("SPARK_GRAFT_PSL_IDN").contains("1")) 7
          else 5
        spark.range(n.toLong).select(col("id").as("doc_id"),
          concat(lit("https://h"), id,
            element_at(suffixes, (col("id") % k + 1).cast("int")),
            lit("/x")).as("url"))
      case None =>
        spark.read.parquet(s"$sfDir/documents.parquet")
          .select(col("doc_id"), concat(lit("https://h"),
            col("doc_id").cast("string"),
            lit(".example.co.uk/x")).as("url"))
    }
    val rows = docs.count()

    def probe(label: String, nRules: Int, mk: => org.apache.spark.sql.Column)
        : Boolean = {
      val t0 = System.nanoTime()
      val q = docs.select(col("doc_id"), mk.as("domain"))
      // plan-side: force full planning + codegen via a zero-row twin
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], docs.schema)
        .select(col("doc_id"), mk.as("domain"))
      empty.queryExecution.executedPlan
      empty.write.format("noop").mode("overwrite").save()
      val planS = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      q.write.format("noop").mode("overwrite").save()
      val execS = (System.nanoTime() - t1) / 1e9
      println(f"PSLSCALE form=$label rules=$nRules rows=$rows " +
        f"plan_s=$planS%.3f exec_s=$execS%.3f")
      planS + execS <= budgetS
    }

    // warm the session once (scan + noop machinery)
    docs.write.format("noop").mode("overwrite").save()

    // `trie-only` as the sole size arg skips the generated-form curve
    // entirely — the production-volume synth leg would pay the gen
    // form's O(|rules|) per row for hours at 10M rows
    var go = !(args.length == 1 && args(0) == "trie-only")
    for (n <- sizes if go) {
      val rules = full.take(n)
      go = probe("gen", rules.size,
        UrlOps.registrableDomainPslGen(
          regexp_extract(col("url"), "^https://([^/]*)/", 1), rules))
      if (!go) println(s"PSLSCALE gen stopped: point exceeded " +
        s"$budgetS s budget at $n rules (the cliff)")
    }
    probe("trie", full.size,
      UrlOps.registrableDomainPsl(
        regexp_extract(col("url"), "^https://([^/]*)/", 1)))
    // the r14 canonicalization leg: same trie, host through IdnAscii
    // first — prices the per-label ACE conversion (ASCII fast path on
    // the default mix; real conversions under SPARK_GRAFT_PSL_IDN=1)
    probe("trie_canon", full.size,
      UrlOps.registrableDomainPslAscii(
        regexp_extract(col("url"), "^https://([^/]*)/", 1)))
    spark.stop()
  }
}
