package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native product-quantization kernels. The codebook (m × k × subDim
  * doubles — a few KB) rides inside the expression and ships to executors
  * with the serialized plan via `addReferenceObj`, exactly like a
  * broadcast-literal. These replace the interpreted higher-order-function
  * pipeline (transform/zip_with/aggregate) in the two PQ hot paths:
  * encoding is a full-corpus pass and ADC scoring runs once per
  * (query, candidate) pair — both belong in tight codegen'd loops, per
  * the same rule that produced [[MinHash60]] and [[CosineSim]].
  * Accumulation order matches the composed forms left-to-right, so
  * results are bit-identical (parity spec-pinned).
  */
object PqKernel {

  /** L2-normalize into a fresh array (input returned as-is at zero norm). */
  def normalize(vec: ArrayData): Array[Double] = {
    val n = vec.numElements()
    val out = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) { val x = vec.getDouble(i); out(i) = x; ss += x * x; i += 1 }
    val norm = math.sqrt(ss)
    if (norm != 0.0) {
      i = 0
      while (i < n) { out(i) /= norm; i += 1 }
    }
    out
  }

  /** Per-subspace nearest-centroid codes of the normalized vector
    * (L2 argmin; first index wins ties, matching `array_position` of the
    * min in the composed form). Codes are BYTES (k ≤ 256 by contract) —
    * the storage width is the whole point of the operator: m=8 byte codes
    * vs a 256-byte float32 vector is the advertised 32× compression.
    */
  def encode(vec: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val v = normalize(vec)
    val m = books.length
    val subDim = books(0)(0).length
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      val off = s * subDim
      var best = 0; var bestD = Double.MaxValue
      var j = 0
      while (j < book.length) {
        val cent = book(j)
        var d = 0.0; var x = 0
        while (x < subDim) { val t = v(off + x) - cent(x); d += t * t; x += 1 }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best.toByte
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Per-query ADC table: `tab[s][j] = <normalized query subvector s,
    * books[s][j]>` as array<array<double>>.
    */
  def adcTable(vec: ArrayData, books: Array[Array[Array[Double]]]): ArrayData = {
    val v = normalize(vec)
    val m = books.length
    val subDim = books(0)(0).length
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val book = books(s)
      val off = s * subDim
      val row = new Array[Any](book.length)
      var j = 0
      while (j < book.length) {
        val cent = book(j)
        var acc = 0.0; var x = 0
        while (x < subDim) { acc += v(off + x) * cent(x); x += 1 }
        row(j) = acc
        j += 1
      }
      out(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score: Σₛ table[s][codes[s]] — m array lookups per candidate.
    * Codes are unsigned bytes (k ≤ 256). A subspace-count mismatch always
    * means codes from one PqIndex were scored against another index's ADC
    * table — silently truncating would return a plausible-but-wrong score
    * and recall would degrade with no error, so it throws.
    */
  def score(codes: ArrayData, table: ArrayData): Double = {
    val m = codes.numElements()
    if (m != table.numElements())
      throw new IllegalArgumentException(
        s"PQ codes have $m subspaces but the ADC table has " +
        s"${table.numElements()} — codes and table come from different " +
        "quantizers")
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += table.getArray(s).getDouble(codes.getByte(s) & 0xff)
      s += 1
    }
    acc
  }
}

case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"pq_encode needs array<double>, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    PqKernel.encode(input.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val books = ctx.addReferenceObj("pqBooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.PqKernel.encode($c, $books)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
  // structural (not reference) equality over the codebooks — see ModelEq
  override def equals(o: Any): Boolean = o match {
    case r: PqEncode => r.child == child &&
      ModelEq.deep(r.codebooks, codebooks)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(ModelEq.deepHash(codebooks)))
}

case class PqAdcTable(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"pq_adc_table needs array<double>, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    PqKernel.adcTable(input.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val books = ctx.addReferenceObj("pqBooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.PqKernel.adcTable($c, $books)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqAdcTable =
    copy(child = newChild)
  override def equals(o: Any): Boolean = o match {
    case r: PqAdcTable => r.child == child &&
      ModelEq.deep(r.codebooks, codebooks)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(ModelEq.deepHash(codebooks)))
}

case class PqAdcScore(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ByteType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score needs (array<tinyint>, array<array<double>>), got $other")
  }
  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqKernel.score(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.expressions.PqKernel.score($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScore =
    copy(left = l, right = r)
}

object PqExpressions {
  def pq_encode(c: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(c), books))
  def pq_adc_table(c: Column, books: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAdcTable(ColumnBridge.expression(c), books))
  def pq_adc_score(codes: Column, table: Column): Column =
    ColumnBridge.column(PqAdcScore(ColumnBridge.expression(codes), ColumnBridge.expression(table)))
}
