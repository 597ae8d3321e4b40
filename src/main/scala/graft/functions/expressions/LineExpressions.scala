package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native line splitters for the text-cleaning family.
  *
  * [[SplitLines]] is `filter(transform(split(text, "\r?\n"), trim),
  * length > 0)` — the `lines()` primitive under the Gopher repetition
  * signals, the C4 structural rules, and paragraph dedup — as ONE
  * codegen'd pass. The composed form paid two interpreted lambdas per
  * document (transform + filter run under interpreted HOF eval).
  * Contract, element for element:
  *   - separators are exactly `\n` and `\r\n` (a lone `\r` is NOT a
  *     separator, same as the regex);
  *   - each piece is trimmed of leading/trailing SPACES ONLY (0x20 —
  *     Spark's `trim`, not Java's `String.trim`);
  *   - empty results are dropped (so regex split's trailing-empty quirks
  *     are unobservable).
  *
  * [[C4KeptLines]] additionally applies the C4 line-keep battery
  * ([[graft.operators.HeuristicFilters.lineKept]]) to each line in the
  * same pass: terminal punctuation (the same compiled `[.!?"]$` Java
  * regex through `Matcher.find`, so `$`-before-final-terminator edge
  * cases match `rlike` exactly), a minimum count of whitespace-separated
  * words (maximal runs of non-`\s` characters — equal to
  * `size(filter(split(l, "\\s+"), len > 0))`), and no "javascript"
  * mention (lower-cased contains — the same `UTF8String.toLowerCase` as
  * Spark's `lower`). The composed form re-split every line inside an
  * interpreted per-line lambda.
  */
object LineKernel {

  /** Raw pieces split on `\n` / `\r\n` (a lone `\r` separates nothing —
    * exactly the `\r?\n` regex). Trailing-empty quirks of regex split are
    * unobservable here: every empty piece is dropped after the trim.
    */
  private def pieces(s: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\n') {
        val end = if (i > start && s.charAt(i - 1) == '\r') i - 1 else i
        out += s.substring(start, end)
        start = i + 1
      }
      i += 1
    }
    out += s.substring(start)
    out.toArray
  }

  /** Spark-`trim`(spaces-only)-then-nonempty lines of the text. */
  def splitLines(text: UTF8String): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    pieces(text.toString).foreach { p =>
      val t = UTF8String.fromString(p).trim()
      if (t.numBytes() > 0) out += t
    }
    new GenericArrayData(out.toArray)
  }

  private val terminal = java.util.regex.Pattern.compile("[.!?\"]$")
  private val javascript = UTF8String.fromString("javascript")

  /** Java `\s` = space, \t, \n, \x0B, \f, \r. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** count of maximal runs of non-`\s` characters — equals the composed
    * `size(filter(split(l, "\\s+"), len > 0))` word count
    */
  private def wordRuns(l: String): Int = {
    var i = 0; var runs = 0
    while (i < l.length) {
      if (!isWs(l.charAt(i)) && (i == 0 || isWs(l.charAt(i - 1)))) runs += 1
      i += 1
    }
    runs
  }

  def c4KeptLines(text: UTF8String, minLineWords: Int): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    pieces(text.toString).foreach { p =>
      val t = UTF8String.fromString(p).trim()
      if (t.numBytes() > 0) {
        val str = t.toString
        if (terminal.matcher(str).find() &&
            wordRuns(str) >= minLineWords &&
            !t.toLowerCase.contains(javascript))
          out += t
      }
    }
    new GenericArrayData(out.toArray)
  }
}

case class SplitLines(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"split_lines needs string, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    LineKernel.splitLines(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.LineKernel.splitLines($c)")
  override protected def withNewChildInternal(newChild: Expression): SplitLines =
    copy(child = newChild)
}

case class C4KeptLines(child: Expression, minLineWords: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"c4_kept_lines needs string, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    LineKernel.c4KeptLines(input.asInstanceOf[UTF8String], minLineWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.LineKernel.c4KeptLines($c, $minLineWords)")
  override protected def withNewChildInternal(newChild: Expression): C4KeptLines =
    copy(child = newChild)
}

object LineExpressions {
  def split_lines(c: Column): Column =
    ColumnBridge.column(SplitLines(ColumnBridge.expression(c)))
  def c4_kept_lines(c: Column, minLineWords: Int): Column =
    ColumnBridge.column(C4KeptLines(ColumnBridge.expression(c), minLineWords))
}
