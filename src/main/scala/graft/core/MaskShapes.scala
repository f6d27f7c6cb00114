package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The geometric mask DSL (reference `ImgDict["Masks"]` schema
  * GSASII_imports.py:146-154; semantics: disk GSASII_imports.py:410-412,
  * polygon/frame even-odd test polymask.for:22-42, ring/arc
  * mask_widget.py:961-976, lines GSASII_imports.py:418-423).
  *
  * Every shape compiles to a pure Column predicate over the pixel/geometry
  * table — fully codegen'd, broadcast-free (shape parameters are literals
  * in the plan), applied once in the geometry job and persisted as the
  * predefined-mask column. True = pixel masked.
  */
sealed trait MaskShape {
  /** Predicate over columns: x_mm/y_mm (detector mm), tth, azim,
    * intensity. */
  def predicate: Column
}

object MaskShape {

  /** Disk mask: (x-cx)^2 + (y-cy)^2 < r^2 (Points entries carry a
    * diameter). */
  final case class Spot(cx: Double, cy: Double, diameter: Double)
      extends MaskShape {
    def predicate: Column = {
      val dx = col("x_mm") - cx; val dy = col("y_mm") - cy
      dx * dx + dy * dy < lit(diameter * diameter / 4.0)
    }
  }

  /** Ring: 2-theta band. */
  final case class Ring(tthCenter: Double, tthWidth: Double)
      extends MaskShape {
    def predicate: Column =
      col("tth").between(tthCenter - tthWidth / 2, tthCenter + tthWidth / 2)
  }

  /** Arc: 2-theta band ∧ wrap-aware azimuth wedge. */
  final case class Arc(tthCenter: Double, azimStart: Double, azimEnd: Double,
                       tthWidth: Double) extends MaskShape {
    def predicate: Column =
      Ring(tthCenter, tthWidth).predicate &&
        graft.geometry.Geometry.azimIn(col("azim"),
          (azimStart, azimEnd))
  }

  /** Whole pixel row / column. */
  final case class XLine(row: Int) extends MaskShape {
    def predicate: Column = col("y") === row
  }
  final case class YLine(colIdx: Int) extends MaskShape {
    def predicate: Column = col("x") === colIdx
  }

  /** Intensity / tth threshold window: mask OUTSIDE [lo, hi]. */
  final case class Threshold(lo: Double, hi: Double) extends MaskShape {
    def predicate: Column =
      col("intensity") < lo || col("intensity") > hi
  }

  /** Polygon interior via the even-odd ray-crossing rule
    * (reference polymask.for:22-42), expressed as a fold of per-edge
    * crossing tests XOR-accumulated — a pure scalar expression, no UDF.
    * Vertices in detector mm; an explicitly closed vertex list (last ==
    * first) is handled by ignoring the duplicate. */
  final case class Polygon(vertices: Seq[(Double, Double)])
      extends MaskShape {
    def predicate: Column = Polygon.contains(col("x_mm"), col("y_mm"),
      vertices)
  }

  object Polygon {
    def contains(x: Column, y: Column,
                 verticesIn: Seq[(Double, Double)]): Column = {
      val vs = if (verticesIn.length > 1 && verticesIn.head == verticesIn.last)
        verticesIn.dropRight(1) else verticesIn
      require(vs.length >= 3, "polygon needs >= 3 vertices")
      val n = vs.length
      (0 until n).map { i =>
        val (xi, yi) = vs(i)
        val (xj, yj) = vs((i + n - 1) % n)
        ((lit(yi) > y) =!= (lit(yj) > y)) &&
          (x < (y - yi) * ((xj - xi) / (yj - yi)) + xi)
      }.reduce(_ =!= _) // boolean XOR accumulation (odd crossing count)
    }
  }

  /** Frame: masks the EXTERIOR of the polygon (reference MakeFrameMask
    * GSASII_imports.py:606-656). */
  final case class Frame(vertices: Seq[(Double, Double)]) extends MaskShape {
    def predicate: Column = !Polygon(vertices).predicate
  }

  /** Union of all shape predicates (mask algebra F2: predefined mask =
    * any shape hits). */
  def combined(shapes: Seq[MaskShape]): Column =
    if (shapes.isEmpty) lit(false)
    else shapes.map(_.predicate).reduce(_ || _)
}

/** `.immask` file parser (reference readMasks GSASII_imports.py:334-359):
  * `key:value` lines with Python-literal values. */
object ImmaskParser {

  def parse(lines: Iterator[String]): Seq[MaskShape] = {
    lines.flatMap { ln =>
      ln.split(":", 2) match {
        case Array(k, v) => parseEntry(k.trim, v.trim)
        case _ => Nil
      }
    }.toSeq
  }

  private[core] def parseEntry(key: String, value: String): Seq[MaskShape] = {
    val nums = PyLiteral.parse(value)
    key match {
      case "Points" => nums.collect {
        case Seq(x: Double, y: Double, d: Double) => MaskShape.Spot(x, y, d) }
      case "Rings" => nums.collect {
        case Seq(c: Double, w: Double) => MaskShape.Ring(c, w) }
      case "Arcs" => nums.collect {
        case Seq(c: Double, Seq(a0: Double, a1: Double), w: Double) =>
          MaskShape.Arc(c, a0, a1, w) }
      case "Polygons" => nums.collect {
        case poly: Seq[_] if poly.nonEmpty && poly.head.isInstanceOf[Seq[_]] =>
          MaskShape.Polygon(poly.collect {
            case Seq(x: Double, y: Double) => (x, y) }) }
      case "Frames" if nums.nonEmpty =>
        val pts = nums.collect { case Seq(x: Double, y: Double) => (x, y) }
        if (pts.length >= 3) Seq(MaskShape.Frame(pts)) else Nil
      case "Xlines" => nums.collect { case d: Double => MaskShape.XLine(d.toInt) }
      case "Ylines" => nums.collect { case d: Double => MaskShape.YLine(d.toInt) }
      case "Thresholds" => nums.lastOption.toSeq.collect {
        case Seq(lo: Double, hi: Double) => MaskShape.Threshold(lo, hi) }
      case _ => Nil
    }
  }
}

/** Minimal Python-literal list parser: nested lists/tuples of numbers. */
private[core] object PyLiteral {

  /** Parse "[...]" into nested Seq[Any] of Double / Seq. Returns the
    * top-level elements. */
  def parse(s: String): Seq[Any] = {
    val (v, rest) = parseValue(s.trim)
    require(rest.trim.isEmpty, s"trailing content: $rest")
    v match {
      case xs: Seq[_] => xs
      case other => Seq(other)
    }
  }

  private def parseValue(s: String): (Any, String) = {
    val t = s.trim
    if (t.startsWith("[") || t.startsWith("(")) {
      val close = if (t.startsWith("[")) ']' else ')'
      var rest = t.drop(1).trim
      val items = scala.collection.mutable.Buffer.empty[Any]
      while (rest.nonEmpty && rest.head != close) {
        val (v, r) = parseValue(rest)
        items += v
        rest = r.trim
        if (rest.startsWith(",")) rest = rest.drop(1).trim
      }
      require(rest.nonEmpty, "unterminated list")
      (items.toSeq, rest.drop(1))
    } else {
      val m = "^[-+0-9.eE]+".r.findFirstIn(t)
        .getOrElse(throw new IllegalArgumentException(s"bad literal: $t"))
      (m.toDouble, t.drop(m.length))
    }
  }
}
