package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The C4 LINE rules (Raffel et al. 2020, arXiv:1910.10683 §2.2) as
  * ONE byte-level pass: a line of `child` survives iff its last
  * non-(horizontal-whitespace) character is terminal punctuation
  * (`. ! ? "` or `”` — [[graft.ops.TextMetrics.C4TerminalChars]]), it
  * carries at least `minWords` maximal non-whitespace runs, and it
  * does not contain "javascript" in any case; surviving lines keep
  * their RAW form, joined by `\n`.
  *
  * Pinned semantics are IDENTICAL to the four-`regexp_replace`
  * deletion-pass form (TextCurationSpec pins the whitespace edges and
  * a property spec drives both forms over random line soup) — this
  * expression exists because the regex chain re-materializes the page
  * string once per pass (measured ~3x the whole-row cost of a single
  * scan at sf0.1), where one pass touches each byte once and returns
  * the INPUT OBJECT when every line survives.
  *
  * Byte-level correctness under UTF-8: all rule characters
  * (whitespace set, `\n`, ASCII punctuation, "javascript") are ASCII,
  * and UTF-8 continuation bytes are >= 0x80 — so a multi-byte
  * character can never read as whitespace/newline, a non-ASCII char
  * counts into the surrounding word run, and the one multi-byte
  * terminal mark (`”` = E2 80 9D) is matched by its final bytes.
  * Null in, null out. Row-local, codegen'd via one static call. */
case class C4CleanLines(child: Expression, minWords: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "c4_clean_lines"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && minWords >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column and minWords >= 1")

  override protected def nullSafeEval(v: Any): Any =
    C4CleanLines.clean(v.asInstanceOf[UTF8String], minWords)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cls = C4CleanLines.getClass.getName.stripSuffix("$")
      s"""
      ${ev.value} = $cls.clean($v, $minWords);
      """
    })

  override protected def withNewChildInternal(c: Expression): C4CleanLines =
    copy(child = c)
}

object C4CleanLines {

  /** Horizontal whitespace — `\s` minus `\n` (a line never contains
    * its own terminator). */
  private def isHoriz(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == 0x0B || b == '\f' || b == '\r'

  private val Js = "javascript".getBytes(
    java.nio.charset.StandardCharsets.US_ASCII)

  /** Case-insensitive ASCII search for "javascript" in [from, to). */
  private def hasJs(a: Array[Byte], from: Int, to: Int): Boolean = {
    val end = to - Js.length
    var i = from
    while (i <= end) {
      var j = 0
      while (j < Js.length &&
        (a(i + j) | 0x20) == Js(j)) j += 1
      if (j == Js.length) return true
      i += 1
    }
    false
  }

  /** One line [from, to) against the three rules. */
  private def lineKept(a: Array[Byte], from: Int, to: Int,
                       minWords: Int): Boolean = {
    // last non-horizontal-ws byte
    var last = to - 1
    while (last >= from && isHoriz(a(last))) last -= 1
    if (last < from) return false
    val b = a(last)
    val terminal = b == '.' || b == '!' || b == '?' || b == '"' ||
      (last - from >= 2 && b == 0x9D.toByte &&
        a(last - 1) == 0x80.toByte && a(last - 2) == 0xE2.toByte)
    if (!terminal) return false
    // maximal non-ws runs
    var runs = 0
    var inRun = false
    var i = from
    while (i <= last && runs < minWords) {
      val ws = isHoriz(a(i))
      if (!ws && !inRun) runs += 1
      inRun = !ws
      i += 1
    }
    if (runs < minWords) return false
    !hasJs(a, from, to)
  }

  /** Surviving lines of `text`, raw, joined by `\n` — the input
    * OBJECT when nothing drops (the dominant clean-prose path
    * allocates nothing). Splitting on `\n` yields one final EMPTY
    * segment for a `\n`-terminated text; it fails the rules like any
    * empty line, which is exactly the regex form's trailing-newline
    * strip. Called from generated code. */
  def clean(text: UTF8String, minWords: Int): UTF8String = {
    if (text == null) return null
    val a = text.getBytes
    val n = a.length
    var out: java.io.ByteArrayOutputStream = null
    var emitted = false
    var dropped = false
    var from = 0
    while (from <= n) {
      var to = from
      while (to < n && a(to) != '\n') to += 1
      if (lineKept(a, from, to, minWords)) {
        if (dropped) {
          if (emitted) out.write('\n')
          out.write(a, from, to - from)
          emitted = true
        }
        // before any drop the output prefix IS the input prefix
      } else if (!dropped) {
        // first drop: materialize the kept prefix (sans its trailing
        // newline — kept lines are non-empty, so from > 0 means a
        // non-empty prefix)
        dropped = true
        out = new java.io.ByteArrayOutputStream(n)
        if (from > 0) {
          out.write(a, 0, from - 1)
          emitted = true
        }
      }
      from = to + 1
    }
    if (!dropped) text else UTF8String.fromBytes(out.toByteArray)
  }
}
