package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native vector-hygiene kernels.
  *
  * [[FiniteVec]] replaces the `isNotNull && !exists(v, x -> x IS NULL OR
  * isnan(x) OR isinf(x))` predicate that gates EVERY ANN corpus pass:
  * `exists` is an interpreted higher-order lambda evaluated per corpus
  * row — the same class as the folds r13/r14 nativized (the lambda-sweep
  * audit counted it 48× in crawl_refresh_e2e's plan alone). The kernel
  * is one codegen'd loop with an early exit on the first unusable
  * component.
  *
  * [[Quantize8]] replaces `transform(v, x -> greatest(-127, least(127,
  * floor(x·scale + 0.5))).cast("int"))` — the int8 storage-tier encoder —
  * with a single pass. Semantics replicate the composed form exactly:
  * null elements stay null, and non-finite components resolve the way
  * the composed plan actually resolves them — Spark's `floor` returns
  * LONG, so the double→long cast (NaN→0, ±Inf→±Long.Max/Min) runs
  * BEFORE the least/greatest clamps (parity-pinned in FunctionsSpec).
  */
object VecKernel {

  /** true iff every component is non-null and finite. `kind` selects the
    * element reader (0 = double, 1 = float, 2 = int, 3 = long — the
    * integer kinds exist because the quantized storage tier runs the same
    * usability gate over its int8 arrays, where only a null component can
    * be unusable). No cast, no copy for any of the four.
    */
  def allFinite(vec: ArrayData, kind: Int): Boolean = {
    val n = vec.numElements()
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return false
      if (kind <= 1) {
        val x = if (kind == 1) vec.getFloat(i).toDouble else vec.getDouble(i)
        if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return false
      }
      i += 1
    }
    true
  }

  def quantize8(vec: ArrayData, isFloat: Boolean, scale: Double): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      // Parity with the composed chain, oddity for oddity (only the
      // finiteVec-gated finite path is a cross-engine contract; these
      // are pinned so the native IS the composed plan, not an
      // approximation of it):
      //  * a NULL element folds to 127 — least/greatest SKIP nulls, so
      //    least(127, null) = 127;
      //  * Spark's floor returns LONG, so the double→long cast (NaN→0,
      //    ±Inf→±Long.Max/Min) runs BEFORE the clamps.
      val l =
        if (vec.isNullAt(i)) 127L
        else {
          val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          math.floor(x * scale + 0.5).toLong
        }
      out(i) = Integer.valueOf(math.max(-127L, math.min(127L, l)).toInt)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Boolean vector-usability gate: FALSE for a null array or any
  * null/NaN/Infinite component, TRUE otherwise — exactly the composed
  * `isNotNull && !exists(...)` predicate's filter behavior (the composed
  * AND folds a null input to false three-valued-ly; this expression is
  * simply never null).
  */
case class FiniteVec(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  private def kind: Int = child.dataType match {
    case ArrayType(DoubleType, _) => 0
    case ArrayType(FloatType, _) => 1
    case ArrayType(IntegerType, _) => 2
    case _ => 3
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) |
         ArrayType(IntegerType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"finite_vec needs an array of float/double/int/long, got $other")
  }
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) false
    else VecKernel.allFinite(v.asInstanceOf[ArrayData], kind)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(isNull = FalseLiteral, code = code"""
      ${c.code}
      boolean ${ev.value} = !${c.isNull} &&
        graft.functions.expressions.VecKernel.allFinite(${c.value}, $kind);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): FiniteVec =
    copy(child = newChild)
}

/** Fixed-range symmetric int8 quantization: `clamp(floor(x·scale + 0.5),
  * ±127)` per component, null components preserved. One codegen'd pass —
  * see [[VecKernel.quantize8]] for the NaN/Inf clamping contract.
  */
case class Quantize8(child: Expression, maxAbs: Double) extends UnaryExpression {
  require(maxAbs > 0, s"quantize8 needs a positive range, got $maxAbs")
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  // containsNull = true matches the composed transform's declared type
  // (its lambda was formally nullable) even though the kernel never
  // emits a null element — plans and written schemas stay identical
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize8 needs array<float> or array<double>, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    VecKernel.quantize8(input.asInstanceOf[ArrayData], isFloat, 127.0 / maxAbs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.VecKernel.quantize8($c, $isFloat, ${127.0 / maxAbs})")
  override protected def withNewChildInternal(newChild: Expression): Quantize8 =
    copy(child = newChild)
}

object VecExpressions {
  def finite_vec(c: Column): Column =
    ColumnBridge.column(FiniteVec(ColumnBridge.expression(c)))
  def quantize8(c: Column, maxAbs: Double): Column =
    ColumnBridge.column(Quantize8(ColumnBridge.expression(c), maxAbs))
}
