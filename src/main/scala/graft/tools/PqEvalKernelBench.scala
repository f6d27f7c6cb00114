package graft.tools
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
/** Interleaved micro-bench + bit-parity check of the PqEncodeSig eval
  * kernel: the shipped long-unscaled accumulator vs the former
  * BigDecimal.add chain, reimplemented here verbatim (dev probe). */
object PqEvalKernelBench {
  def main(args: Array[String]): Unit = {
    val sub = 8; val sd = 8; val k = 16
    val rnd = new scala.util.Random(7)
    val cbv: Vector[Vector[Vector[Double]]] = Vector.tabulate(sub)(s =>
      Vector.tabulate(k)(c => Vector.tabulate(sd)(d =>
        rnd.nextDouble() * 200 - 100)))
    val expr = graft.functions.PqEncodeSig(
      org.apache.spark.sql.catalyst.expressions.Literal(1.0), cbv)
    val cb: Array[Array[Double]] = cbv.map(_.flatten.toArray).toArray
    // the former accumulator, verbatim
    def oldEval(arr: Array[Double]): Array[Int] = {
      val codes = new Array[Int](sub)
      var s = 0
      while (s < sub) {
        val base = s * sd
        var bestCode = 0
        var bestD = Double.PositiveInfinity
        val flat = cb(s)
        var c = 0
        while (c < k) {
          val cOff = c * sd
          var acc = java.math.BigDecimal.ZERO
          var i = 0
          while (i < sd) {
            val diff = arr(base + i) - flat(cOff + i)
            val term = diff * diff
            acc = acc.add(java.math.BigDecimal.valueOf(term)
              .setScale(9, java.math.RoundingMode.HALF_UP))
            i += 1
          }
          val d = acc.doubleValue()
          if (d < bestD) { bestD = d; bestCode = c }
          c += 1
        }
        codes(s) = bestCode
        s += 1
      }
      codes
    }
    val n = 20000
    val vecs = Array.fill(n)(Array.fill(sub * sd)(rnd.nextDouble() * 200 - 100))
    // parity across the corpus
    var mismatches = 0
    vecs.foreach { v =>
      val a = expr.nullSafeEval(new GenericArrayData(v))
        .asInstanceOf[ArrayData].toIntArray()
      if (!java.util.Arrays.equals(a, oldEval(v))) mismatches += 1
    }
    println(s"PARITY mismatches: $mismatches / $n")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"KERNEL $label ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    for (rep <- 1 to 4) {
      time(s"old rep$rep")(vecs.foreach(oldEval))
      time(s"new rep$rep")(vecs.foreach(v =>
        expr.nullSafeEval(new GenericArrayData(v))))
    }
  }
}
