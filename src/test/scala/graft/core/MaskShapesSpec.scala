package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MaskShapesSpec extends SparkSpec {
  import spark.implicits._

  /** Scala reference even-odd test. */
  def refContains(x: Double, y: Double, vs: Seq[(Double, Double)]): Boolean = {
    val n = vs.length
    var inside = false
    var i = 0
    while (i < n) {
      val (xi, yi) = vs(i); val (xj, yj) = vs((i + n - 1) % n)
      if ((yi > y) != (yj > y) && x < (y - yi) * ((xj - xi) / (yj - yi)) + xi)
        inside = !inside
      i += 1
    }
    inside
  }

  val concave = Seq((0.0, 0.0), (10.0, 1.0), (9.0, 10.0), (5.0, 4.0),
    (1.0, 9.0))

  test("polygon predicate matches reference even-odd on a grid") {
    val pts = for { x <- 0 to 11; y <- 0 to 11 }
      yield (x + 0.31, y + 0.47)
    val df = pts.toDF("x_mm", "y_mm")
    val got = df.select($"x_mm", $"y_mm",
      MaskShape.Polygon(concave).predicate.as("in")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getBoolean(2)).toMap
    pts.foreach { p =>
      assert(got(p) == refContains(p._1, p._2, concave), s"at $p")
    }
    assert(got.values.count(identity) > 5) // polygon isn't empty
  }

  test("closed vertex list (last == first) is accepted") {
    val closed = concave :+ concave.head
    val df = Seq((5.0, 2.0)).toDF("x_mm", "y_mm")
    val a = df.select(MaskShape.Polygon(concave).predicate).collect()(0)
    val b = df.select(MaskShape.Polygon(closed).predicate).collect()(0)
    assert(a == b)
  }

  test("frame masks the exterior") {
    val df = Seq((5.0, 2.0), (100.0, 100.0)).toDF("x_mm", "y_mm")
    val out = df.select(MaskShape.Frame(concave).predicate).collect()
      .map(_.getBoolean(0)).toSeq
    assert(out == Seq(false, true))
  }

  test("spot / ring / arc / line / threshold predicates") {
    val df = Seq(
      (1.0, 1.0, 3.0, 10.0, 500, 5, 7),
      (8.0, 8.0, 5.5, 350.0, 70000, 2, 3))
      .toDF("x_mm", "y_mm", "tth", "azim", "intensity", "y", "x")
    def hits(s: MaskShape) = df.select(s.predicate).collect()
      .map(_.getBoolean(0)).toSeq
    assert(hits(MaskShape.Spot(1.0, 1.0, 2.0)) == Seq(true, false))
    assert(hits(MaskShape.Ring(3.0, 0.5)) == Seq(true, false))
    // arc wedge wrapping through 0 deg
    assert(hits(MaskShape.Arc(5.5, 340.0, 20.0, 1.0)) == Seq(false, true))
    assert(hits(MaskShape.XLine(5)) == Seq(true, false))
    assert(hits(MaskShape.Threshold(0, 60000)) == Seq(false, true))
  }

  test("immask parser: all shape kinds") {
    val shapes = ImmaskParser.parse(
      """Points:[[214.5, 216.1, 2.5]]
        |Rings:[[3.1, 0.2], [5.5, 0.1]]
        |Arcs:[[4.2, [30.0, 60.0], 0.3]]
        |Polygons:[[[1.0,1.0],[5.0,1.0],[3.0,4.0],[1.0,1.0]]]
        |Frames:[[0.0,0.0],[400.0,0.0],[400.0,400.0],[0.0,400.0]]
        |Thresholds:[(0, 65535), [10.0, 60000.0]]
        |Xlines:[12, 99]
        |Ylines:[7]
        |""".stripMargin.linesIterator)
    assert(shapes.count(_.isInstanceOf[MaskShape.Spot]) == 1)
    assert(shapes.count(_.isInstanceOf[MaskShape.Ring]) == 2)
    assert(shapes.count(_.isInstanceOf[MaskShape.Arc]) == 1)
    assert(shapes.count(_.isInstanceOf[MaskShape.Polygon]) == 1)
    assert(shapes.count(_.isInstanceOf[MaskShape.Frame]) == 1)
    assert(shapes.collect { case t: MaskShape.Threshold => t }
      == Seq(MaskShape.Threshold(10.0, 60000.0)))
    assert(shapes.collect { case l: MaskShape.XLine => l.row }.toSet
      == Set(12, 99))
    assert(shapes.collect { case l: MaskShape.YLine => l.colIdx } == Seq(7))
  }
}
