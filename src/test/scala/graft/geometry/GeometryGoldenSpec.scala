package graft.geometry

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.core.Calibration

/** Golden parity with the reference geometry maps: the fixture
  * `geometry_golden.json` holds per-pixel (tth, azm, G, pola) values
  * computed by executing the reference's own numpy geometry functions
  * (GetTthAzmG2 / Polarization, GSASII_imports.py:1023-1046,558-579) on a
  * tilted + rotated calibration. Only the VALUES are committed — the
  * engine must reproduce them from its independent column-math
  * implementation. */
class GeometryGoldenSpec extends SparkSpec {

  test("geometry matches reference maps on a tilted, rotated detector") {
    val url = getClass.getResource("/geometry_golden.json")
    assert(url != null, "fixture missing")
    val txt = scala.io.Source.fromURL(url).mkString
    // minimal JSON pull: rows array of flat objects with numeric fields
    val rowRe = ("""\{\s*"y": (\d+),\s*"x": (\d+),\s*"tth": ([-0-9.eE]+),""" +
      """\s*"azm": ([-0-9.eE]+),\s*"G": ([-0-9.eE]+),""" +
      """\s*"pola": ([-0-9.eE]+)\s*\}""").r
    val golden = rowRe.findAllMatchIn(txt).map { m =>
      (m.group(1).toInt, m.group(2).toInt) ->
        (m.group(3).toDouble, m.group(4).toDouble, m.group(5).toDouble,
          m.group(6).toDouble)
    }.toMap
    assert(golden.size == 256)

    val cal = Calibration(
      pixelSize = (150.0, 150.0), center = (1.0, 1.2), distance = 80.0,
      tilt = 2.0, rotation = 30.0, azmthOff = 5.0, detDepth = 0.1,
      polaVal = 0.99, imageSize = (16, 16))
    val geo = Geometry.build(spark, cal)
      .select(col("y"), col("x"), col("tth"), col("azim"), col("dist_sq"),
        col("pol"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap

    golden.foreach { case (k, (gTth, gAzm, gG, gPola)) =>
      val (tth, azm, g, pola) = geo(k)
      assert(math.abs(tth - gTth) < 1e-9, s"tth at $k: $tth vs $gTth")
      assert(math.abs(azm - gAzm) < 1e-9, s"azm at $k: $azm vs $gAzm")
      assert(math.abs(g - gG) < 1e-9, s"G at $k: $g vs $gG")
      assert(math.abs(pola - gPola) < 1e-9, s"pola at $k: $pola vs $gPola")
    }
  }
}
