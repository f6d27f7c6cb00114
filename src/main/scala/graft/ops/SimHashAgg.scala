package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One-pass SimHash vote aggregator: input 64-bit shingle hashes, buffer
  * = 64 signed bit-votes, output = the fingerprint whose bit j is set
  * when bit j was 1 in more hashes than not. Identical semantics to 64
  * independent conditional sums (vote > 0 sets the bit), in one
  * fixed-size buffer instead of 64 generated aggregate slots. */
object SimHashAgg {

  private class Agg extends Aggregator[Long, Array[Int], Long] {
    def zero: Array[Int] = new Array[Int](64)

    def reduce(buf: Array[Int], h: Long): Array[Int] = {
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1
        j += 1
      }
      buf
    }

    def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var j = 0
      while (j < 64) { a(j) += b(j); j += 1 }
      a
    }

    def finish(buf: Array[Int]): Long = {
      var out = 0L; var j = 0
      while (j < 64) { if (buf(j) > 0) out |= (1L << j); j += 1 }
      out
    }

    def bufferEncoder: Encoder[Array[Int]] = Encoders.kryo[Array[Int]]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column form: `simhash(hash64)` → long fingerprint. */
  def simhash(hash: Column): Column = udaf(new Agg).apply(hash)
}
