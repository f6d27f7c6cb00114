package graft

import org.apache.spark.sql.functions._

import graft.core.MaskShape
import graft.ops.RobustStats
import graft.stencil.CCL

/** Property-style invariants over seeded random cases (SURVEY §5.2):
  * permutation invariance of robust stats, polygon vs reference even-odd,
  * CCL vs union-find on random masks. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  val rnd = new scala.util.Random(20260812)

  test("property: median/MAD invariant under permutation") {
    (1 to 5).foreach { _ =>
      val vs = List.fill(4 + rnd.nextInt(60))(rnd.nextDouble() * 2000 - 1000)
      val r1 = RobustStats.medianMad(vs.map(("g", _)).toDF("g", "v"),
        Seq("g"), "v").collect()(0)
      val r2 = RobustStats.medianMad(
        scala.util.Random.shuffle(vs).map(("g", _)).toDF("g", "v"),
        Seq("g"), "v").collect()(0)
      assert(r1.getDouble(1) == r2.getDouble(1))
      assert(r1.getDouble(3) == r2.getDouble(3))
    }
  }

  test("property: polygon membership equals reference implementation") {
    def refContains(x: Double, y: Double,
                    vs: Seq[(Double, Double)]): Boolean = {
      val n = vs.length
      var inside = false
      var i = 0
      while (i < n) {
        val (xi, yi) = vs(i); val (xj, yj) = vs((i + n - 1) % n)
        if ((yi > y) != (yj > y) &&
          x < (y - yi) * ((xj - xi) / (yj - yi)) + xi) inside = !inside
        i += 1
      }
      inside
    }
    (1 to 5).foreach { _ =>
      val n = 3 + rnd.nextInt(6)
      // distinct y's avoid horizontal-edge degeneracy
      val ys = rnd.shuffle((0 until 40).toList).take(n)
        .map(_ * 0.5 + rnd.nextDouble() * 0.1)
      val vs = ys.map(y => (rnd.nextDouble() * 20, y))
      val pts = for { x <- 0 to 20; y <- 0 to 20 }
        yield (x + 0.13, y + 0.77)
      val got = pts.toDF("px", "py")
        .select($"px", $"py",
          MaskShape.Polygon.contains($"px", $"py", vs).as("in"))
        .collect().map(r => (r.getDouble(0), r.getDouble(1)) ->
          r.getBoolean(2)).toMap
      pts.foreach { p =>
        assert(got(p) == refContains(p._1, p._2, vs), s"at $p poly $vs")
      }
    }
  }

  test("property: CCL equals union-find oracle on random masks") {
    def oracle(pts: Set[(Int, Int)]): Set[Set[(Int, Int)]] = {
      val idx = pts.toSeq.sorted.zipWithIndex.toMap
      val parent = Array.tabulate(idx.size)(identity)
      def find(i: Int): Int = { var r = i
        while (parent(r) != r) r = parent(r); parent(i) = r; r }
      for { p <- pts; (dy, dx) <- Seq((0,1),(1,-1),(1,0),(1,1))
            q = (p._1 + dy, p._2 + dx) if pts(q) } {
        val (ri, rj) = (find(idx(p)), find(idx(q)))
        if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
      pts.groupBy(p => find(idx(p))).values.toSet
    }
    (1 to 5).foreach { _ =>
      val pts = Set.fill(20 + rnd.nextInt(180))(
        (rnd.nextInt(31), rnd.nextInt(31)))
      val got = CCL.label(pts.toSeq.toDF("y", "x"), width = 31)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
        .toMap
      val gotParts = got.groupBy(_._2).values.map(_.keySet).toSet
      assert(gotParts == oracle(pts))
    }
  }

  test("property: as-of join equals per-row scalar lookup on random " +
      "keyed series") {
    import graft.ops.AsofJoin
    (1 to 3).foreach { _ =>
      val keys = Seq("a", "b", "c")
      // row ids are the fill index — UNIQUE, so the toMap comparison
      // below cannot collapse colliding ids last-wins and flake
      val left = Seq.tabulate(60)(i => (keys(rnd.nextInt(3)),
        rnd.nextInt(1000).toLong, i.toLong))
      // unique (key, time) right rows, per the operator's contract
      val right = Seq.fill(40)((keys(rnd.nextInt(3)),
          rnd.nextInt(1000).toLong, rnd.nextDouble()))
        .groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      val expect = left.map { case (k, t, lid) =>
        val m = right.filter(r => r._1 == k && r._2 <= t)
        (lid, if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
      }.toMap
      val got = AsofJoin.backward(
          left.toDF("k", "t", "lid"), right.toDF("k", "rt", "pv"),
          Seq("k"), "t", "rt", payload = Seq("pv"))
        .select("lid", "pv").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(got == expect)
    }
  }

  test("property: sessionize equals the scalar gap-scan on random " +
      "event sets") {
    import graft.ops.Sessions
    (1 to 3).foreach { _ =>
      val gap = 50L
      // ids are the fill index (unique — a colliding id would collapse
      // the toMap comparison); (k, t) still deduped for determinism
      val evs = Seq.tabulate(80)(i => (rnd.nextInt(4).toLong,
        rnd.nextInt(2000).toLong, i.toLong))
        .groupBy(e => (e._1, e._2)).map(_._2.head).toSeq // unique (k, t)
      val expect = evs.groupBy(_._1).flatMap { case (k, es) =>
        var idx = 0L; var prev = Long.MinValue
        es.sortBy(_._2).map { case (_, t, id) =>
          if (prev == Long.MinValue || t - prev > gap) idx += 1
          prev = t
          id -> idx
        }
      }
      val got = Sessions.sessionize(evs.toDF("k", "t", "id"), Seq("k"),
          col("t"), gapNs = gap)
        .select("id", "session_idx").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect)
    }
  }

  test("property: bloom filter never false-negatives on random key sets") {
    import graft.ops.Sketches
    (1 to 3).foreach { _ =>
      val m = 1 << (8 + rnd.nextInt(6)) // 256 .. 8192 bits
      val k = 2 + rnd.nextInt(5)
      val keys = Seq.fill(50 + rnd.nextInt(300))(rnd.nextLong()).distinct
      val df = keys.toDF("key")
      val bits = Sketches.buildBloom(df, col("key"), m, k)
      val kept = df.where(Sketches.mightContain(bits, m, k, col("key")))
        .count()
      assert(kept == keys.length,
        s"false negative at m=$m k=$k: $kept of ${keys.length}")
    }
  }

  test("property: CMS estimate >= exact on random skewed counts") {
    import graft.ops.Sketches
    (1 to 3).foreach { _ =>
      val width = 1 << (3 + rnd.nextInt(6)) // 8 .. 256: forced collisions
      val rows = Seq.fill(2000)(s"k${(rnd.nextGaussian() * 20).toInt}")
        .toDF("k")
      val exact = rows.groupBy("k").count()
      val est = Sketches.cmsEstimate(
          Sketches.cmsSketch(rows, col("k"), 3, width),
          exact.select("k"), "k", 3, width)
        .join(exact, "k").collect()
      est.foreach(r => assert(r.getLong(1) >= r.getLong(2),
        s"CMS bound violated at width=$width: $r"))
    }
  }
}
