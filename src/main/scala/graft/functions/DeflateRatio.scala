package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: DEFLATE(level 6, raw/nowrap)
  * output bytes over input bytes — the Gopher/Dolma-family filter that
  * catches machine-generated boilerplate and keyword-stuffed spam
  * (ratio well below ~0.4: pathologically repetitive) and binary-ish
  * noise (ratio near or above 1.0: incompressible) with ONE row-local
  * pass and no vocabulary.
  *
  * Row-local expression (the signature-family shape): zero shuffles,
  * rides the scan at 100 TB. DEFLATE output for a fixed level and
  * input is deterministic for a given zlib implementation — stable
  * across reruns, partitionings and JVMs of the same runtime (what
  * rerun-reproducible curation needs) — but it is NOT a cross-engine
  * constant, so this operator is spec-gated rather than oracle-gated
  * (no DuckDB row; the brief's rows-only class).
  *
  * Null document → null; empty document → 1.0 by convention (nothing
  * to compress, nothing saved). The ratio is rounded to 6 dp like the
  * rest of the quality-feature family. */
case class DeflateRatio(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column")

  override protected def nullSafeEval(v: Any): Any = {
    val raw = v.asInstanceOf[UTF8String].getBytes
    if (raw.isEmpty) return 1.0
    // eval is single-threaded per task, so one Deflater + buffer per
    // thread, reset() between rows — a fresh Deflater per row is a
    // native malloc/free + zlib stream init that would dominate the
    // actual compression work on a 100 TB scan
    val d = DeflateRatio.deflater.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    val buf = DeflateRatio.buffer.get()
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    java.math.BigDecimal.valueOf(out.toDouble / raw.length)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  override protected def withNewChildInternal(c: Expression): DeflateRatio =
    copy(child = c)
}

object DeflateRatio {
  // level 6 (zlib default), nowrap: no 6-byte zlib header/checksum
  // biasing short documents
  private val deflater: ThreadLocal[Deflater] =
    ThreadLocal.withInitial(() => new Deflater(6, true))
  private val buffer: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](8192))
}
