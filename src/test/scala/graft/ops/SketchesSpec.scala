package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sketch-family invariants: Bloom-prune join identity (no false
  * negatives, FP rate sane), Count-Min bounds and collision behavior,
  * HyperLogLog register determinism and estimate accuracy. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // ---------------- Bloom ----------------

  test("bloom: membership has no false negatives; FP rate is bounded") {
    val keys = (0L until 500L).map(i => i * 7 + 3)
    val keysDf = keys.toDF("k")
    val m = 1 << 14
    val k = 5
    val bits = Sketches.buildBloom(keysDf, col("k"), m, k)
    // every inserted key tests positive
    val inserted = keysDf
      .where(Sketches.mightContain(bits, m, k, col("k"))).count()
    assert(inserted == 500)
    // non-keys: FP rate near (1 - e^{-kn/m})^k ~ 0.0002 at this load;
    // allow two orders of slack, the point is "prune drops almost all"
    val probes = (100000L until 120000L).toDF("k")
    val fps = probes
      .where(Sketches.mightContain(bits, m, k, col("k"))).count()
    assert(fps < 200, s"false-positive rate too high: $fps / 20000")
  }

  test("bloom: prunedJoin is identical to the plain join") {
    val big = (0L until 2000L).map(i => (i, s"v$i")).toDF("bk", "payload")
    val small = (0L until 2000L by 13).map(i => (i, i * 2))
      .toDF("sk", "attr")
    val pruned = Sketches.prunedJoin(big, small, "bk", "sk",
        m = 1 << 12, k = 4)
      .select("bk", "payload", "sk", "attr")
      .collect().map(_.toSeq).toSet
    val plain = big.join(small, col("bk") === col("sk"))
      .select("bk", "payload", "sk", "attr")
      .collect().map(_.toSeq).toSet
    assert(pruned == plain)
  }

  test("bloom: empty build side yields an all-reject filter") {
    val none = Seq.empty[Long].toDF("k")
    val bits = Sketches.buildBloom(none, col("k"), 1 << 10, 3)
    assert(bits.forall(_ == 0L))
    val probes = (0L until 100L).toDF("k")
    assert(probes.where(
      Sketches.mightContain(bits, 1 << 10, 3, col("k"))).count() == 0)
  }

  // ---------------- Count-Min ----------------

  test("cms: estimate >= exact always, and exact when width >> keys") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 5000).map(_ => s"key${rnd.nextInt(40)}").toDF("k")
    val exact = rows.groupBy("k").agg(count(lit(1)).as("n_exact"))
    // wide sketch: 40 keys into 4x1024 buckets — collisions essentially
    // impossible per row, so min-over-rows is exact
    val wide = Sketches.cmsSketch(rows, col("k"), 4, 1024)
    val est = Sketches.cmsEstimate(wide, exact.select("k"), "k", 4, 1024)
      .join(exact, "k").collect()
    assert(est.length == 40)
    est.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"wide sketch should be exact: $r"))
    // narrow sketch: forced collisions — the CMS guarantee is est >= exact
    val narrow = Sketches.cmsSketch(rows, col("k"), 2, 8)
    val estN = Sketches.cmsEstimate(narrow, exact.select("k"), "k", 2, 8)
      .join(exact, "k").collect()
    estN.foreach(r => assert(r.getLong(1) >= r.getLong(2),
      s"CMS lower-bound violation: $r"))
  }

  test("cms: sketch of a union equals elementwise sum of sketches") {
    val a = (0 until 300).map(i => s"k${i % 11}").toDF("k")
    val b = (0 until 500).map(i => s"k${i % 17}").toDF("k")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val sa = toMap(Sketches.cmsSketch(a, col("k"), 3, 64))
    val sb = toMap(Sketches.cmsSketch(b, col("k"), 3, 64))
    val su = toMap(Sketches.cmsSketch(a.union(b), col("k"), 3, 64))
    val merged = (sa.keySet ++ sb.keySet).map(p =>
      p -> (sa.getOrElse(p, 0L) + sb.getOrElse(p, 0L))).toMap
    assert(su == merged)
  }

  test("cms: unknown keys probe to 0 on untouched buckets") {
    val rows = Seq("a", "a", "b").toDF("k")
    val sketch = Sketches.cmsSketch(rows, col("k"), 4, 4096)
    val est = Sketches.cmsEstimate(sketch,
        Seq("never-seen-key-xyz").toDF("k"), "k", 4, 4096)
      .collect()
    assert(est.length == 1 && est(0).getLong(1) == 0L)
  }

  // ---------------- HyperLogLog ----------------

  test("hll: registers are insertion-order and duplication invariant") {
    val vs = (0L until 1000L).map(i => i * 31 + 5)
    val once = Sketches.hllRegisters(vs.toDF("k"), col("k"), 8)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val shuffledDup = new scala.util.Random(3)
      .shuffle(vs ++ vs ++ vs.take(100))
    val again = Sketches.hllRegisters(shuffledDup.toDF("k"), col("k"), 8)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(once == again)
  }

  test("hll: estimate within 10% of exact across cardinality decades") {
    // p=8 gives sigma ~ 1.04/sqrt(256) ~ 6.5%; 10% is ~1.5 sigma — this
    // is a determinism-friendly smoke of accuracy, not a stats proof
    Seq(100L, 1000L, 20000L).foreach { n =>
      val df = (0L until n).map(i => i * 127 + 13).toDF("k")
      val regs = Sketches.hllRegisters(df, col("k"), 8)
      val est = Sketches.hllEstimate(regs, 8).collect()(0).getDouble(0)
      assert(math.abs(est - n) / n < 0.10,
        s"estimate $est too far from exact $n")
    }
  }

  test("hll: merging register tables = sketch of the union") {
    val a = (0L until 3000L).map(i => i * 3).toDF("k")
    val b = (1500L until 6000L).map(i => i * 3).toDF("k")
    val ra = Sketches.hllRegisters(a, col("k"), 8)
    val rb = Sketches.hllRegisters(b, col("k"), 8)
    val mergedRegs = ra.union(rb).groupBy("bucket")
      .agg(max(col("register")).as("register"))
    val estMerged = Sketches.hllEstimate(mergedRegs, 8)
      .collect()(0).getDouble(0)
    val estUnion = Sketches.hllEstimate(
      Sketches.hllRegisters(a.union(b), col("k"), 8), 8)
      .collect()(0).getDouble(0)
    assert(estMerged == estUnion)
  }

  test("hll: grouped registers match per-group standalone sketches") {
    val df = (0L until 4000L).map(i => (s"g${i % 3}", i * 11)).toDF("g", "k")
    val grouped = Sketches.hllEstimate(
        Sketches.hllRegisters(df, col("k"), 8, Seq(col("g"))),
        8, Seq(col("g")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    (0 until 3).foreach { g =>
      val solo = Sketches.hllEstimate(
        Sketches.hllRegisters(df.where(col("g") === s"g$g"), col("k"), 8),
        8).collect()(0).getDouble(0)
      assert(grouped(s"g$g") == solo)
    }
  }

  test("hll: empty input estimates 0 (global no-group aggregate)") {
    val empty = Seq.empty[Long].toDF("k")
    val est = Sketches.hllEstimate(
      Sketches.hllRegisters(empty, col("k"), 8), 8).collect()
    assert(est.length == 1 && est(0).getDouble(0) == 0.0)
  }

  test("hll: saturated-rank edge — hash with all-zero remainder") {
    // bucket = pmod(hash, 256); rest = hash >>> 8 == 0 happens only for
    // hashes in [0, 256); synthesize via the register-table contract
    // instead: feed a register table containing the saturated rank and
    // check the estimator accepts it (term scales to exactly 1)
    val regs = Seq((0, 57), (1, 1), (2, 12)).toDF("bucket", "register")
    val est = Sketches.hllEstimate(regs, 8).collect()(0).getDouble(0)
    assert(est > 0 && !est.isNaN)
  }
}
