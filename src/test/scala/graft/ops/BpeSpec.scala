package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE tokenizer training: hand-replayed merge choices on a tiny
  * corpus, greedy left-to-right application (including the l == r run
  * case the fold and the oracle's parity rule must agree on),
  * overlapping pair COUNTING, deterministic ties, early exhaustion,
  * and the encode-reproduces-training identity. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference greedy merge on plain Scala — the independent model the
    * distributed fold is checked against. */
  private def refMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  test("hand-replayed training on a tiny corpus: counts, argmax, ties") {
    // low lower lowest, weighted by repetition
    val docs = Seq("low low low lower", "lowest low").toDF("text")
    val (merges, _) = Bpe.train(docs, "text", merges = 3)
    // words: low x4, lower x1, lowest x1
    // pairs: (l,o) 6, (o,w) 6, (w,e) 2, (e,r) 1, (e,s) 1, (s,t) 1
    // step1: tie (l,o) vs (o,w) at 6 -> lexicographic (l,o)
    assert(merges(0) == Bpe.Merge(1, "l", "o", 6L))
    // step2: (lo,w) 6 wins
    assert(merges(1) == Bpe.Merge(2, "lo", "w", 6L))
    // step3: (low,e) 2 wins over (e,r)/(e,s)/(s,t) at 1
    assert(merges(2) == Bpe.Merge(3, "low", "e", 2L))
  }

  test("overlapping pairs are counted (aaa -> two (a,a)), and greedy " +
      "application keeps even run offsets (the l == r case)") {
    val docs = Seq("aaa aaaa").toDF("text")
    val (merges, words) = Bpe.train(docs, "text", merges = 1)
    // counts: aaa has 2 (a,a), aaaa has 3 -> 5
    assert(merges(0) == Bpe.Merge(1, "a", "a", 5L))
    val syms = words.select(col("word"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(syms("aaa") == Seq("aa", "a")) // greedy: positions 0-1 merge
    assert(syms("aaaa") == Seq("aa", "aa"))
  }

  test("applyMerge matches the reference greedy walk on generated " +
      "symbol sequences") {
    val alphabet = Seq("a", "b", "ab", "ba")
    // all sequences of length 5 over a 4-symbol alphabet where merged
    // symbols collide textually with pairs — the adversarial space
    val seqs = (0 until 4 * 4 * 4 * 4 * 4).map { n =>
      Seq.tabulate(5)(i => alphabet((n / math.pow(4, i).toInt) % 4))
    }
    val df = seqs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "syms")
    for ((l, r) <- Seq(("a", "b"), ("a", "a"), ("ab", "a"), ("b", "ba"))) {
      val got = df.select(col("id"), Bpe.applyMerge(col("syms"), l, r)
          .as("m")).collect()
        .map(row => row.getLong(0) -> row.getSeq[String](1)).toMap
      seqs.zipWithIndex.foreach { case (s, i) =>
        assert(got(i.toLong) == refMerge(s, l, r),
          s"seq $s pair ($l,$r): ${got(i.toLong)} != ${refMerge(s, l, r)}")
      }
    }
  }

  test("early exhaustion: a corpus of single-char words stops at zero " +
      "merges; a fully-mergeable one stops when words are single symbols") {
    val single = Seq("a b c").toDF("text")
    assert(Bpe.train(single, "text", merges = 5)._1.isEmpty)
    val tiny = Seq("ab ab").toDF("text")
    val (m, w) = Bpe.train(tiny, "text", merges = 5)
    assert(m == Seq(Bpe.Merge(1, "a", "b", 2L))) // then no pairs remain
    assert(w.select(col("syms")).collect()
      .forall(_.getSeq[String](0) == Seq("ab")))
  }

  test("vocabIds: base chars sorted first, merges in training order, " +
      "duplicate-mint keeps the first id, ids dense") {
    val docs = Seq("ab ab abc c b").toDF("text")
    // pairs: (a,b) 3 -> merge1 "ab"; then (ab,c) 1 -> merge2 "abc"
    val (merges, _) = Bpe.train(docs, "text", merges = 2)
    assert(merges.map(m => (m.lhs, m.rhs)) == Seq(("a", "b"), ("ab", "c")))
    val v = Bpe.vocabIds(docs, "text", merges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // base alphabet {a, b, c} sorted = ids 0..2, then merges
    assert(v == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "ab" -> 3L,
      "abc" -> 4L))
    // duplicate mint: ("ab","c") and ("a","bc") would both make "abc";
    // simulate with a hand merge list — first introduction keeps the id
    val dup = Seq(Bpe.Merge(1, "ab", "c", 9L), Bpe.Merge(2, "a", "bc", 5L))
    val v2 = Bpe.vocabIds(docs, "text", dup).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v2("abc") == 3L && v2.values.toSeq.sorted == (0L to 3L))
  }

  test("encodeDocs: ids decode back to the exact documents, and an " +
      "OOV word fails loudly naming it") {
    val docs = Seq((0L, "low lower low"), (1L, "lowest low"))
      .toDF("doc_id", "text")
    val (merges, words) = Bpe.train(docs, "text", merges = 4)
    val vocab = Bpe.vocabIds(docs, "text", merges)
    val enc = Bpe.encodeDocs(docs, "doc_id", "text", words, vocab)
    val sym = vocab.collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    val got = enc.collect().map(r => r.getLong(0) ->
      r.getSeq[Long](1).map(sym).mkString).toMap
    // decode property: concatenated symbols == the document sans spaces
    assert(got == Map(0L -> "lowlowerlow", 1L -> "lowestlow"))
    // and the id stream respects word order (doc 0 starts with "low"'s
    // split, whatever it merged to)
    val ids0 = enc.where(col("doc_id") === 0).collect()(0).getSeq[Long](1)
    assert(ids0.nonEmpty && sym(ids0.head).startsWith("l"))

    val oov = Seq((9L, "unseen low")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Bpe.encodeDocs(oov, "doc_id", "text", words, vocab).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("absent") &&
      m.contains("unseen")), s"wanted the loud OOV error, got ${msgs(e)}")

    // token-less documents emit ids = [], never vanish
    val withEmpty = Seq((20L, "low"), (21L, "")).toDF("doc_id", "text")
    val encE = Bpe.encodeDocs(withEmpty, "doc_id", "text", words, vocab)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(encE.keySet == Set(20L, 21L) && encE(21L).isEmpty)

    // a vocab table missing a symbol of some word's trained split
    // fails loudly naming the symbol (mismatched-corpora guard)
    val holed = vocab.where(col("symbol") =!= "low")
    val e2 = intercept[Exception] {
      Bpe.encodeDocs(Seq((30L, "low")).toDF("doc_id", "text"),
        "doc_id", "text", words, holed).collect()
    }
    assert(msgs(e2).exists(m => m.contains("symbol absent")),
      s"wanted the loud symbol error, got ${msgs(e2)}")
  }

  test("vocabIdsFromWords numbers off an existing word table (no " +
      "corpus), identically to the corpus form; base sort is UTF-8 " +
      "byte order") {
    val docs = Seq("low lower").toDF("text")
    val (merges, words) = Bpe.train(docs, "text", merges = 2)
    val a = Bpe.vocabIds(docs, "text", merges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Bpe.vocabIdsFromWords(words, merges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    // supplementary-plane char (UTF-8 F0 90 80 80) must sort AFTER
    // U+FFFD (EF BF BD) — byte order, not Java's UTF-16 unit order
    // (where the surrogate 0xD800 would sort below 0xFFFD)
    val ud = Seq("� " + new String(Character.toChars(0x10000)))
      .toDF("text")
    val v = Bpe.vocabIds(ud, "text", Nil).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v("�") < v(new String(Character.toChars(0x10000))),
      s"UTF-8 byte order violated: $v")
  }

  /** Reference multi-pair greedy walk — the [[refMerge]] model extended
    * to a disjoint pair set (at most one rule can match per position,
    * the applyMerges precondition). */
  private def refMergeSet(syms: Seq[String],
                          pairs: Seq[(String, String)]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length &&
          pairs.exists(p => syms(i) == p._1 && syms(i + 1) == p._2)) {
        out += (syms(i) + syms(i + 1)); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  test("trainBatched at batchN=1 reproduces sequential train " +
      "bit-for-bit (merge list and final word table)") {
    val docs = Seq("low low low lower", "lowest low banana bandana")
      .toDF("text")
    val (seqM, seqW) = Bpe.train(docs, "text", merges = 6)
    val (batM, batW) = Bpe.trainBatched(docs, "text", merges = 6,
      batchN = 1)
    assert(batM.map(m => (m.step, m.lhs, m.rhs, m.pair_count)) ==
      seqM.map(m => (m.step, m.lhs, m.rhs, m.pair_count)))
    assert(batM.map(_.round_no) == (1 to 6)) // one pick per round
    val a = seqW.select(col("word"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val b = batW.select(col("word"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(a == b)
  }

  test("trainBatched equals sequential when the round's picks live in " +
      "disjoint words (the equivalence corpus), in ONE round") {
    // ab x10, cd x9, ef x8 — three disjoint-alphabet words
    val docs = Seq((("ab " * 10) + ("cd " * 9) + ("ef " * 8)).trim)
      .toDF("text")
    val (seqM, _) = Bpe.train(docs, "text", merges = 3)
    val (batM, _) = Bpe.trainBatched(docs, "text", merges = 3, batchN = 3)
    assert(batM.map(m => (m.step, m.lhs, m.rhs, m.pair_count)) ==
      seqM.map(m => (m.step, m.lhs, m.rhs, m.pair_count)))
    assert(batM.forall(_.round_no == 1))
  }

  test("a member conflict defers the lower-ranked pair to the NEXT " +
      "round (greedy disjoint selection)") {
    // (a,b)=10 and (b,c)=9 share b: round 1 takes only (a,b)
    val docs = Seq((("ab " * 10) + ("bc " * 9)).trim).toDF("text")
    val (m, _) = Bpe.trainBatched(docs, "text", merges = 2, batchN = 2)
    assert(m == Seq(
      Bpe.BatchedMerge(1, 1, "a", "b", 10L),
      Bpe.BatchedMerge(2, 2, "b", "c", 9L)))
  }

  test("selectRoundPairs: concat collisions are excluded in BOTH " +
      "directions, and the fallback argmax path is exact past the " +
      "prefix cap") {
    // member == earlier pick's concatenation
    val pc1 = Seq(("ab", "bc", 10L), ("abbc", "x", 9L), ("q", "z", 8L))
      .toDF("l", "r", "cnt")
    assert(Bpe.selectRoundPairs(pc1, 3) ==
      Seq(("ab", "bc", 10L), ("q", "z", 8L)))
    // concat == earlier pick's member
    val pc2 = Seq(("abbc", "x", 10L), ("ab", "bc", 9L), ("q", "z", 8L))
      .toDF("l", "r", "cnt")
    assert(Bpe.selectRoundPairs(pc2, 3) ==
      Seq(("abbc", "x", 10L), ("q", "z", 8L)))
    // fallback: n=2 -> prefix cap 16; rows 2..16 all conflict with the
    // top pick, the only disjoint partner sits PAST the cap — the
    // fallback filtered argmax must find it (never an arbitrary cap)
    val rows = ("a", "b", 100L) +:
      (1 to 15).map(i => ("b", s"x$i", 100L - i)) :+ ("q", "z", 1L)
    val pc3 = rows.toDF("l", "r", "cnt")
    assert(Bpe.selectRoundPairs(pc3, 2) ==
      Seq(("a", "b", 100L), ("q", "z", 1L)))
  }

  test("applyMerges (multi-pair single pass) matches the reference " +
      "greedy walk on generated sequences") {
    val alphabet = Seq("a", "b", "c", "d")
    val seqs = (0 until 4 * 4 * 4 * 4 * 4).map { n =>
      Seq.tabulate(5)(i => alphabet((n / math.pow(4, i).toInt) % 4))
    }
    val df = seqs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "syms")
    val pairs = Seq(("a", "b"), ("c", "d")) // disjoint members + concats
    val got = df.select(col("id"), Bpe.applyMerges(col("syms"), pairs)
        .as("m")).collect()
      .map(row => row.getLong(0) -> row.getSeq[String](1)).toMap
    seqs.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) == refMergeSet(s, pairs),
        s"seq $s: ${got(i.toLong)} != ${refMergeSet(s, pairs)}")
    }
  }

  test("applyMerges rejects a conflicting pair set loudly (the " +
      "single-pass proof's precondition is guarded, not assumed)") {
    // shared member
    val e1 = intercept[IllegalArgumentException] {
      Bpe.applyMerges(col("syms"), Seq(("a", "b"), ("b", "c")))
    }
    assert(e1.getMessage.contains("share a member or concatenation"))
    // concatenation colliding with a member
    val e2 = intercept[IllegalArgumentException] {
      Bpe.applyMerges(col("syms"), Seq(("ab", "bc"), ("abbc", "x")))
    }
    assert(e2.getMessage.contains("abbc"))
  }

  test("encodeWordsBatched replays a batched table round-by-round, " +
      "reproducing the training final table bit-for-bit") {
    val docs = Seq("low low low lower", "lowest low banana bandana")
      .toDF("text")
    val (merges, trained) = Bpe.trainBatched(docs, "text", merges = 6,
      batchN = 3)
    val encoded = Bpe.encodeWordsBatched(Bpe.wordTable(docs, "text"),
      merges, checkpointEvery = 1)
    val a = trained.select(col("word"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val b = encoded.select(col("word"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(a == b)
  }

  test("a batched table completes the full id pipeline: asMerges -> " +
      "vocabIdsFromWords -> encodeDocs decodes back exactly") {
    val docs = Seq((0L, "low lower low"), (1L, "lowest low"))
      .toDF("doc_id", "text")
    val (merges, words) = Bpe.trainBatched(docs, "text", merges = 4,
      batchN = 2)
    val vocab = Bpe.vocabIdsFromWords(words, Bpe.asMerges(merges))
    val sym = vocab.collect().map(r => r.getLong(1) -> r.getString(0)).toMap
    // dense ids, base chars first
    assert(sym.keySet == (0L until sym.size).toSet)
    val got = Bpe.encodeDocs(docs, "doc_id", "text", words, vocab)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Long](1).map(sym).mkString).toMap
    assert(got == Map(0L -> "lowlowerlow", 1L -> "lowestlow"))
  }

  test("encodeWords on character-split input reproduces the training " +
      "final table bit-for-bit") {
    val docs = Seq("low low low lower", "lowest low banana bandana")
      .toDF("text")
    val (merges, trained) = Bpe.train(docs, "text", merges = 6)
    val encoded = Bpe.encodeWords(Bpe.wordTable(docs, "text"), merges)
    val a = trained.select(col("word"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val b = encoded.select(col("word"), col("syms")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(a == b)
    // and fertility over the trained vocab is well-formed
    val f = Bpe.fertility(docs, "text",
      encoded).collect().head
    assert(f.getDouble(0) >= 1.0 && f.getLong(1) == 8L)
  }
}
