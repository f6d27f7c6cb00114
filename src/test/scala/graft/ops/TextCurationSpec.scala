package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Row-local curation passes: repetition-quality features and PII
  * redaction — edge cases against scalar reference implementations. */
class TextCurationSpec extends SparkSpec {
  import spark.implicits._

  private def rep(texts: String*): Seq[(Double, Double, Double)] =
    texts.toDF("text")
      .select(TextMetrics.repetitionFeatures(col("text")).as("f"))
      .select("f.dup_token_frac", "f.dup_ngram_frac", "f.top_token_frac")
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
      .toSeq

  test("repetition: all-distinct, all-same, and mixed documents") {
    val Seq(distinct, same, mixed) = rep(
      "a b c d e", "x x x x", "a b a b c")
    assert(distinct == (0.0, 0.0, 0.2)) // 5 distinct, 3 distinct grams, top 1/5
    // "x x x x": 1 distinct of 4; grams "x x x" x2 -> 1 distinct of 2
    assert(same == (0.75, 0.5, 1.0))
    // "a b a b c": 3 distinct of 5; grams aba,bab,abc distinct -> 0
    assert(mixed == (0.4, 0.0, 0.4))
  }

  test("repetition: degenerate lengths (1 and 2 tokens) yield 0 ngram frac") {
    val Seq(one, two) = rep("solo", "two words")
    assert(one == (0.0, 0.0, 1.0))
    assert(two == (0.0, 0.0, 0.5))
  }

  test("repetition: matches a scalar reference on random word soup") {
    val rnd = new scala.util.Random(42)
    val vocab = Seq("the", "data", "spark", "row", "scan")
    val docs = (0 until 30).map(_ =>
      (0 until (3 + rnd.nextInt(40))).map(_ =>
        vocab(rnd.nextInt(vocab.length))).mkString(" "))
    val got = rep(docs: _*)
    docs.zip(got).foreach { case (doc, (dupTok, dupGram, topTok)) =>
      val toks = doc.split(" ").toSeq
      val grams = toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(dupTok == r6(1.0 - toks.distinct.size.toDouble / toks.size))
      assert(dupGram == r6(
        if (grams.nonEmpty) 1.0 - grams.distinct.size.toDouble / grams.size
        else 0.0))
      assert(topTok == r6(
        toks.groupBy(identity).values.map(_.size).max.toDouble / toks.size))
    }
  }

  test("tokenCountBpe: piece semantics pinned against hand counts") {
    val got = Seq(
      "hello world",        // 5+5 letters -> 2+2 pieces
      "internationalization", // 20 letters -> 5 pieces
      "a 12345 b!",         // 1 + (3+2 digits) + 1 + 1 punct = 5
      "x,y.z",              // 3 letters + 2 punct = 5
      "   ",                // whitespace only -> 0
      "")                   // empty -> 0
      .toDF("t").select(TextMetrics.tokenCountBpe(col("t")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(4L, 5L, 5L, 5L, 0L, 0L))
  }

  test("whitespace class: vertical tab is whitespace on BOTH engines' " +
    "reading (the Ws explicit-class contract)") {
    // Java \s includes \x0B, RE2's does not -- the repo spells the class
    // explicitly everywhere (graft.core.Ws) so both engines agree.
    // Pinned: VT separates pieces/words, it is never counted as one.
    val vt = "ab\u000Bcd"
    val pieces = Seq(vt).toDF("t")
      .select(TextMetrics.tokenCountBpe(col("t")))
      .collect().head.getLong(0)
    assert(pieces == 2L) // "ab", "cd" -- the VT itself is NOT a piece
    val normalized = Seq(vt).toDF("t")
      .select(TextMetrics.normalizeWs(col("t")))
      .collect().head.getString(0)
    assert(normalized == "ab cd")
    // and the explicit fragments really are Java-\s-equivalent
    for (c <- Seq(' ', '\t', '\n', '\u000B', '\f', '\r'))
      assert(c.toString.matches(graft.core.Ws.One), s"char ${c.toInt}")
    assert(!"x".matches(graft.core.Ws.One))
  }

  test("unigramLogprob: hand-computed tiny corpus") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextMetrics.unigramLogprob(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    // totals: a=2, b=2, c=1 of 5. Mirror the decimal-sum mean exactly:
    // exact decimal sum of the 6 dp-rounded logs, ONE cast to double,
    // then the double division by the count
    val lpA = r6(math.log(2.0 / 5)); val lpC = r6(math.log(1.0 / 5))
    def decMean(vals: Seq[Double]): Double =
      vals.map(java.math.BigDecimal.valueOf)
        .reduce(_.add(_)).doubleValue() / vals.size
    assert(got(1L)._2 == 3 && got(2L)._2 == 2)
    assert(got(1L)._1 == decMean(Seq(lpA, lpA, lpA)))
    assert(got(2L)._1 == decMean(Seq(lpA, lpC)))
  }

  test("unigramLogprob: empty and all-null corpora yield empty results") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextMetrics.unigramLogprob(empty, "doc_id", "text").count() == 0)
    val nulls = Seq((1L, null: String)).toDF("doc_id", "text")
    assert(TextMetrics.unigramLogprob(nulls, "doc_id", "text").count() == 0)
  }

  test("messy whitespace: tokenCount == exploded count == unigram total") {
    // the round-7 foot-gun: doubled spaces / tabs / trailing space —
    // tokenCount is now DEFINED as size(tokens(...)), so the count, the
    // exploded vocabulary rows, and the unigram denominator cannot drift
    val docs = Seq(
      (1L, "a  b"),               // doubled space -> an empty token
      (2L, " lead and  trail "),  // leading + doubled + trailing
      (3L, "tab\there"),          // tab is NOT a split point for tokens()
      (4L, "plain single spaced")).toDF("doc_id", "text")
    val perDoc = docs.select(col("doc_id"),
        TextMetrics.tokenCount(col("text")).cast("long").as("n"),
        size(split(col("text"), " ")).cast("long").as("nsplit"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    perDoc.foreach { case (_, n, nsplit) => assert(n == nsplit) }
    assert(perDoc.map(t => t._1 -> t._2).toMap ==
      Map(1L -> 3L, 2L -> 6L, 3L -> 1L, 4L -> 3L))
    val lp = TextMetrics.unigramLogprob(docs, "doc_id", "text")
    val nTok = lp.agg(sum("n_tokens")).collect()(0).getLong(0)
    val total = docs.agg(sum(
      TextMetrics.tokenCount(col("text")).cast("long")))
      .collect()(0).getLong(0)
    assert(nTok == total, s"unigram denominator $total != vocab sum $nTok")
    assert(lp.count() == 4)
  }

  test("normalizeWs aligns the literal-space and \\s+ tokenizer families") {
    val messy = Seq("a  b", "\ttab\nnewline  mix ", "already clean")
      .toDF("text")
    // reference side: strip ALL leading/trailing whitespace (Spark's
    // trim only strips spaces), then split on whitespace runs
    val rows = messy.select(
        TextMetrics.tokens(TextMetrics.normalizeWs(col("text"))).as("lit"),
        split(regexp_replace(col("text"), "^\\s+|\\s+$", ""), "\\s+")
          .as("re")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1)) }
  }

  test("redact: emails and phones replaced, counts match") {
    val rows = Seq(
      "write to alice.smith+tag@sub.example.co.uk for details",
      "call +1-555-0100 or +44-201-9999 now",
      "no pii here at all",
      "two mails a@b.io and c.d@e-corp.com plus +1-555-1234")
      .toDF("text")
      .select(TextMetrics.redactPii(col("text")).as("red"),
        TextMetrics.piiCounts(col("text")).as("c"))
      .select("red", "c.n_emails", "c.n_phones")
      .collect()
    assert(rows(0).getString(0) == "write to <EMAIL> for details")
    assert(rows(0).getInt(1) == 1 && rows(0).getInt(2) == 0)
    assert(rows(1).getString(0) == "call <PHONE> or <PHONE> now")
    assert(rows(1).getInt(1) == 0 && rows(1).getInt(2) == 2)
    assert(rows(2).getString(0) == "no pii here at all")
    assert(rows(2).getInt(1) == 0 && rows(2).getInt(2) == 0)
    assert(rows(3).getString(0) ==
      "two mails <EMAIL> and <EMAIL> plus <PHONE>")
    assert(rows(3).getInt(1) == 2 && rows(3).getInt(2) == 1)
  }

  test("redact: pure projection — the plan has no exchange") {
    val df = Seq("a@b.io").toDF("text")
      .select(TextMetrics.redactPii(col("text")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("c4Flags: line rules (terminal punct, >=3 words, javascript) " +
      "and page rules (>=5 sentences, lorem, brace) — each rule " +
      "isolated, interaction cases pinned") {
    def flags(t: String) = Seq(t).toDF("t")
      .select(TextMetrics.c4Flags(col("t")).as("c"))
      .select(col("c.text_clean"), col("c.n_lines_kept"),
        col("c.n_sentences"), col("c.has_lorem"), col("c.has_brace"),
        col("c.keep")).collect()(0)
    val page = Seq(
      "A proper first sentence with enough words.",
      "no terminal punctuation here",
      "Please enable JavaScript to continue.",
      "Too few.",
      "A second proper sentence follows right here! Indeed it does!",
      "And a fifth one closes the page with room to spare.",
      "Then a sixth sentence seals the keep decision?").mkString("\n")
    val r = flags(page)
    // kept: lines 1, 5, 6, 7 (no-punct, javascript and <3-words
    // drop); sentence marks across them: 1 + 2 + 1 + 1 = 5, exactly
    // the keep floor
    assert(r.getLong(1) == 4 && r.getLong(2) == 5)
    assert(!r.getBoolean(3) && !r.getBoolean(4))
    assert(r.getBoolean(5), r.toString)
    assert(!r.getString(0).toLowerCase.contains("javascript"))
    // a lorem line SURVIVES line-level (proper sentence) but drops
    // the page; a brace inside a dropped line still drops the page
    val lorem = flags(page + "\nLorem ipsum dolor sit amet.")
    assert(lorem.getLong(1) == 5 && !lorem.getBoolean(5) &&
      lorem.getBoolean(3))
    val brace = flags(page + "\nvar config = { debug: true };")
    assert(brace.getLong(1) == 4 && !brace.getBoolean(5) &&
      brace.getBoolean(4))
    // below the sentence floor: 4 sentences -> cut
    val thin = flags(Seq(
      "One proper sentence stands alone.",
      "Two proper sentences stand together!",
      "Three is still not enough for the floor.",
      "Four misses the floor too?").mkString("\n"))
    assert(thin.getLong(2) == 4 && !thin.getBoolean(5))
  }

  test("c4Flags: whitespace edges of the codegen'd line rules — words " +
      "are maximal non-ws runs, the terminal rule reads through " +
      "trailing tabs/CR, kept lines keep their raw form") {
    def kept(t: String): (String, Long) = {
      val r = Seq(t).toDF("t")
        .select(TextMetrics.c4Flags(col("t")).as("c"))
        .select(col("c.text_clean"), col("c.n_lines_kept")).collect()(0)
      (r.getString(0), r.getLong(1))
    }
    // a leading tab is NOT an extra word: two words -> dropped
    assert(kept("\tOnly two.") == (("", 0L)))
    // trailing tab/CR after the terminal mark: the line survives, and
    // survives UNTRIMMED
    assert(kept("This line ends properly.\t") ==
      (("This line ends properly.\t", 1L)))
    assert(kept("This line ends properly.\r") ==
      (("This line ends properly.\r", 1L)))
    // blank and ws-only interior lines vanish with their newlines
    assert(kept("A good first sentence here.\n\n \t\nAnd a good second one.")
      == (("A good first sentence here.\nAnd a good second one.", 2L)))
    // a trailing newline (phantom empty final line) is not a kept line
    assert(kept("A good single sentence stays.\n") ==
      (("A good single sentence stays.", 1L)))
    // final line without terminator still subject to every rule
    assert(kept("A good first sentence here.\nbad tail line") ==
      (("A good first sentence here.", 1L)))
  }

  test("C4CleanLines: the byte-level pass is equivalent to the " +
      "builtin regex-deletion reference over random line soup " +
      "(whitespace edges, multibyte marks, javascript casings)") {
    // the pure-regex reference form (three line-deletion passes + a
    // trailing-newline strip) the expression replaced for cost — the
    // pinned semantics, restated independently. (?d) = UNIX_LINES:
    // without it Java's (?m) also treats a bare \r as a line
    // terminator, silently splitting CR-carrying lines the \n-only
    // contract (expression, DuckDB twin, the former lambda's split)
    // keeps whole
    def ref(text: String, minWords: Int): String = {
      val H = "[ \\t\\x0B\\f\\r]"
      val N = "[^ \\t\\n\\x0B\\f\\r]"
      val le = "(?:\\n|\\z)"
      val few =
        if (minWords == 1) ""
        else s"(?:$N+(?:$H+$N+){0,${minWords - 2}}$H*)?"
      text
        .replaceAll(s"(?idm)^[^\\n]*javascript[^\\n]*$le", "")
        .replaceAll(s"(?dm)^$H*$few$le", "")
        .replaceAll(
          s"(?dm)^[^\\n]*[^.!?\"” \\t\\x0B\\f\\r\\n]$H*$le", "")
        .replaceAll("\\n+\\z", "")
    }
    val atoms = Array("a", "bc", " ", "\t", "\r", "", "\f", ".",
      "!", "?", "\"", "”", "{", "é", "道", "javascript",
      "JavaScript", "JAVASCRIPT", "javascrip", "word", "\n", "\n\n")
    val rnd = new scala.util.Random(4216)
    val texts = Seq.tabulate(300) { _ =>
      (0 until (1 + rnd.nextInt(30)))
        .map(_ => atoms(rnd.nextInt(atoms.length))).mkString
    } ++ Seq("", "\n", " \n ", "a.", "one two three.")
    for (minWords <- Seq(1, 2, 3, 5)) {
      val got = texts.toDF("t")
        .select(org.apache.spark.sql.graftshim.Internals.column(
          graft.functions.C4CleanLines(
            org.apache.spark.sql.graftshim.Internals
              .expression(col("t")), minWords)))
        .collect().map(_.getString(0))
      val want = texts.map(ref(_, minWords))
      got.zip(want).zip(texts).foreach { case ((g, w), t) =>
        assert(g == w, s"minWords=$minWords input=${t.replace("\n", "\\n")}")
      }
    }
  }
}
