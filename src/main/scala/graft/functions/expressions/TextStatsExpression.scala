package graft.functions.expressions

import graft.functions.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** All five `text_stats` signals in ONE pass over the string.
  *
  * The composed [[TextFunctions]] versions are each a regexp/replace
  * chain, and the five of them together walk every document ~10× (split,
  * six punctuation `replace`s, two `regexp_replace`s, seven
  * `array_intersect`s, md5) — the bench's single heaviest query. This
  * expression computes the identical contract in two linear scans (one
  * over the raw text, one over the lowered text) plus one md5, no regex
  * engine at all, and stays inside whole-stage codegen via
  * [[TextStats.compute]].
  *
  * Contract — field for field IDENTICAL to the composed originals (pinned
  * by `TextStatsSpec` against both the composed plan and the DuckDB
  * oracle):
  *
  *   - `n_tokens`  = [[TextFunctions.tokenCount]]: maximal runs of
  *     non-whitespace (Java `\s` = space/tab/LF/VT/FF/CR) in
  *     `lower(trim(text))`, empties dropped;
  *   - `punct_bp`  = basis points of [[TextFunctions.punctRatio]]:
  *     occurrences of `.,!?;:` over the code-point length of the RAW text
  *     (0.0 for empty);
  *   - `lang_pred` = [[TextFunctions.langId]]: DISTINCT marker hits per
  *     language, highest wins, ties resolve in [[TextFunctions.LangMarkers]]
  *     order, all-zero → "und";
  *   - `quality_bp` = basis points of [[TextFunctions.qualityScore]], the
  *     double arithmetic replicated operation-for-operation (same IEEE
  *     rounding) — stopword distinct-hits over the de-duplicated marker
  *     union, non-whitespace code points for mean word length;
  *   - `fingerprint` = [[TextFunctions.fingerprint]]: md5 hex of
  *     `lower(trim(text))` with every whitespace run collapsed to one
  *     space (trim strips ASCII spaces only — a leading tab survives as
  *     one leading space, exactly like the regexp form).
  */
case class TextStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = TextStats.schema
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"text_stats needs string, got $other")
  }
  // NULL text does NOT null the whole struct: the composed originals each
  // see null independently — langId falls through to "und", qualityScore's
  // null-skipping least/greatest land on 0.5, the rest propagate null. The
  // fused row mirrors that field-for-field ([[TextStats.nullRow]]), so
  // fused and composed plans agree on null documents (TextStatsSpec pins it).
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextStats.nullRow()
    else TextStats.compute(v.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = childGen.code +
        code"""
           |$javaType ${ev.value} = ${childGen.isNull}
           |  ? graft.functions.expressions.TextStats.nullRow()
           |  : graft.functions.expressions.TextStats.compute(${childGen.value});
           |""".stripMargin,
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {

  // n_tokens/punct_bp/fingerprint are nullable: a null document nulls
  // them; lang_pred and quality_bp still resolve (see [[nullRow]])
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = true),
    StructField("punct_bp", LongType, nullable = true),
    StructField("lang_pred", StringType, nullable = false),
    StructField("quality_bp", LongType, nullable = false),
    StructField("fingerprint", StringType, nullable = true)))

  /** The fused row for a NULL document — field-for-field what the composed
    * plan computes: `size(null)`/division/md5 propagate null for
    * n_tokens/punct_bp/fingerprint; `langId`'s when-chain falls through
    * null conditions to `"und"`; and qualityScore's `least`/`greatest`
    * SKIP nulls, so its null-document value is 0.3·least(1.0) +
    * 0.3·(1−least(1.0)) + 0.2·least(1.0) + 0.2·(greatest(0.0)/8) = 0.5 →
    * 5000 bp (TextStatsSpec pins this against the live composed plan).
    */
  def nullRow(): InternalRow = new GenericInternalRow(
    Array[Any](null, null, UTF8String.fromString("und"), 5000L, null))

  private val langs: Array[String] = TextFunctions.LangMarkers.map(_._1).toArray
  private val nLangs = langs.length

  /** marker string → (40-bit per-lang seen mask, distinct-marker bit).
    * Lang l's markers occupy bits [l*8, l*8+8); a marker shared by two
    * languages (none today, but the contract allows it) sets both
    * segments while still counting once toward the stopword hit via its
    * single distinct bit — matching `array_intersect` against the
    * de-duplicated marker union.
    */
  private val markerBits: java.util.HashMap[String, Array[Long]] = {
    val m = new java.util.HashMap[String, Array[Long]]()
    val distinct = TextFunctions.LangMarkers.flatMap(_._2).distinct.zipWithIndex.toMap
    for (((_, ms), li) <- TextFunctions.LangMarkers.zipWithIndex;
         (marker, mi) <- ms.zipWithIndex) {
      val entry = m.computeIfAbsent(marker, _ => Array(0L, 0L))
      entry(0) |= 1L << (li * 8 + mi)
      entry(1) |= 1L << distinct(marker)
    }
    m
  }
  private val maxMarkerLen: Int =
    TextFunctions.LangMarkers.flatMap(_._2).map(_.length).max

  private val md5Local = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val hexDigits = "0123456789abcdef".toCharArray

  /** Java regex `\s`: the six whitespace chars `[ \t\n\x0B\f\r]` — the
    * exact class `split(_, "\\s+")` / `regexp_replace(_, "\\s+", _)` use.
    */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  @inline private def isPunct(c: Char): Boolean =
    c == '.' || c == ',' || c == '!' || c == '?' || c == ';' || c == ':'

  def compute(input: UTF8String): InternalRow = {
    val raw = input.toString
    // Spark's lower() goes through UTF8String.toLowerCase — call the very
    // same method so non-ASCII case mapping is bit-identical
    val low = input.toLowerCase.toString

    // ---- pass 1: RAW text — code-point length, punct count, non-ws count
    var len = 0; var nPunct = 0; var nonWs = 0
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      len += 1
      if (Character.isHighSurrogate(c) && i + 1 < raw.length &&
          Character.isLowSurrogate(raw.charAt(i + 1))) i += 1 // one code point
      if (isPunct(c)) nPunct += 1
      if (!isWs(c)) nonWs += 1
      i += 1
    }

    // ---- pass 2: LOWERED text — tokens, marker hits, normalized md5.
    // trim() strips ASCII spaces only; the normalized form then collapses
    // every interior/remaining-edge whitespace run to a single space.
    var start = 0
    var end = low.length
    while (start < end && low.charAt(start) == ' ') start += 1
    while (end > start && low.charAt(end - 1) == ' ') end -= 1

    val norm = new java.lang.StringBuilder(end - start)
    var nTokens = 0
    var langSeen = 0L   // 8 bits per language: distinct markers seen
    var stopSeen = 0L   // 1 bit per distinct marker across all languages
    var tokStart = -1
    i = start
    var pendingWs = false
    while (i <= end) {
      val atEnd = i == end
      val c = if (atEnd) ' ' else low.charAt(i)
      if (atEnd || isWs(c)) {
        if (tokStart >= 0) { // token [tokStart, i)
          nTokens += 1
          val tl = i - tokStart
          if (tl <= maxMarkerLen) {
            val bits = markerBits.get(low.substring(tokStart, i))
            if (bits != null) { langSeen |= bits(0); stopSeen |= bits(1) }
          }
          tokStart = -1
        }
        if (!atEnd) pendingWs = true
      } else {
        if (tokStart < 0) tokStart = i
        if (pendingWs) { norm.append(' '); pendingWs = false }
        norm.append(c)
      }
      i += 1
    }
    // trailing whitespace that trim left behind (tabs etc.) collapses to
    // one space and SURVIVES in the normalized fingerprint text (leading
    // runs were already flushed as the pending-space before token 1)
    if (pendingWs) norm.append(' ')
    val normStr = norm.toString

    // ---- language decision: first lang (declaration order) at max > 0
    var best = 0
    var li = 0
    while (li < nLangs) {
      val s = java.lang.Long.bitCount((langSeen >>> (li * 8)) & 0xffL)
      if (s > best) best = s
      li += 1
    }
    var lang = "und"
    if (best > 0) {
      li = 0
      var found = false
      while (li < nLangs && !found) {
        if (java.lang.Long.bitCount((langSeen >>> (li * 8)) & 0xffL) == best) {
          lang = langs(li); found = true
        }
        li += 1
      }
    }

    // ---- doubles: replicate the composed plan operation-for-operation
    val punct = if (len == 0) 0.0 else nPunct.toDouble / len
    val n = nTokens.toDouble
    val stopFrac = java.lang.Long.bitCount(stopSeen).toDouble / math.max(n, 1.0)
    val avgWl = nonWs.toDouble / math.max(n, 1.0)
    val quality =
      0.3 * math.min(1.0, n / 50.0) +
      0.3 * (1.0 - math.min(1.0, punct * 10.0)) +
      0.2 * math.min(1.0, stopFrac * 4.0) +
      0.2 * math.min(1.0, math.max(avgWl - 2.0, 0.0) / 8.0)

    // ---- fingerprint: md5 hex of the normalized utf-8 bytes
    val d = md5Local.get()
    d.reset()
    val dig = d.digest(normStr.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = new Array[Char](32)
    var b = 0
    while (b < 16) {
      hex(b * 2) = hexDigits((dig(b) >> 4) & 0xf)
      hex(b * 2 + 1) = hexDigits(dig(b) & 0xf)
      b += 1
    }

    new GenericInternalRow(Array[Any](
      nTokens,
      math.floor(punct * 10000 + 0.5).toLong,
      UTF8String.fromString(lang),
      math.floor(quality * 10000 + 0.5).toLong,
      UTF8String.fromString(new String(hex))))
  }

  def textStats(c: Column): Column =
    ColumnBridge.column(TextStats(ColumnBridge.expression(c)))
}

/** Σ floor(numChars(token)/d) over an array<string> — the long-word
  * subword-extra term of [[TextFunctions.subwordCountEstimate]] as ONE
  * codegen'd pass. Replaces the interpreted
  * `aggregate(toks, 0, (acc, t) => acc + floor(length(t)/8).cast("int"))`
  * HOF on the full-corpus token-budget path (per-row lambda eval +
  * boxing — the same rule that produced [[ModPChecksum]]). Contract is
  * bit-identical to the HOF: code-point lengths (Spark `length` =
  * `UTF8String.numChars`), `(int) floor(len / d.0)` per element — exact
  * integer division for the non-negative lengths — int accumulator, and
  * NULL on any null element (the HOF's three-valued fold). The null
  * check compiles in only when the child type says containsNull = true;
  * `tokens()` output is containsNull = false and keeps the primitive
  * loop.
  */
case class SumLenDiv(child: Expression, d: Int) extends UnaryExpression {
  require(d > 0, s"sum_len_div needs a positive divisor, got $d")
  override def dataType: DataType = IntegerType
  private def elemNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def nullable: Boolean = child.nullable || elemNullable
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"sum_len_div needs array<string>, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    SumLenDiv.computeBoxed(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], d)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (!elemNullable)
      defineCodeGen(ctx, ev,
        c => s"graft.functions.expressions.SumLenDiv.compute($c, $d)")
    else nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("boxed")
      s"""
         |java.lang.Integer $boxed = graft.functions.expressions.SumLenDiv.computeBoxed($c, $d);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.intValue(); }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): SumLenDiv =
    copy(child = newChild)
}

object SumLenDiv {
  def compute(xs: org.apache.spark.sql.catalyst.util.ArrayData, d: Int): Int = {
    val n = xs.numElements()
    var acc = 0
    var i = 0
    while (i < n) {
      acc += xs.getUTF8String(i).numChars() / d
      i += 1
    }
    acc
  }

  def computeBoxed(xs: org.apache.spark.sql.catalyst.util.ArrayData,
                   d: Int): java.lang.Integer = {
    val n = xs.numElements()
    var acc = 0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      acc += xs.getUTF8String(i).numChars() / d
      i += 1
    }
    java.lang.Integer.valueOf(acc)
  }

  def sum_len_div(c: Column, d: Int): Column =
    ColumnBridge.column(SumLenDiv(ColumnBridge.expression(c), d))
}
