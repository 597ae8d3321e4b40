package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native PCA projection kernel: `out_j = Σ_i (v_i − mean_i) · comp_j_i`.
  * The mean and component matrix (k × dim doubles — a few KB) ride inside
  * the expression via `addReferenceObj`, like the PQ codebooks; the
  * projection is a full-corpus pass and belongs in a tight codegen'd loop
  * (the transform/aggregate composition runs under interpreted lambda
  * eval — the [[MinHash60]]/[[PqKernel]] rule).
  */
object PcaKernel {

  def project(vec: ArrayData, mean: Array[Double],
              comps: Array[Array[Double]]): ArrayData = {
    val dim = mean.length
    if (vec.numElements() != dim)
      throw new IllegalArgumentException(
        s"pca_project: vector has ${vec.numElements()} dims, model has $dim")
    val centered = new Array[Double](dim)
    var i = 0
    while (i < dim) { centered(i) = vec.getDouble(i) - mean(i); i += 1 }
    val out = new Array[Any](comps.length)
    var j = 0
    while (j < comps.length) {
      val c = comps(j)
      var acc = 0.0
      i = 0
      while (i < dim) { acc += centered(i) * c(i); i += 1 }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class PcaProject(child: Expression, mean: Array[Double],
                      components: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"pca_project needs array<double>, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    PcaKernel.project(input.asInstanceOf[ArrayData], mean, components)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("pcaMean", mean, "double[]")
    val c = ctx.addReferenceObj("pcaComps", components, "double[][]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.expressions.PcaKernel.project($v, $m, $c)")
  }
  override protected def withNewChildInternal(newChild: Expression): PcaProject =
    copy(child = newChild)
  // structural (not reference) equality over the model arrays — see ModelEq
  override def equals(o: Any): Boolean = o match {
    case r: PcaProject => r.child == child && ModelEq.deep(r.mean, mean) &&
      ModelEq.deep(r.components, components)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(ModelEq.deepHash(mean)),
      Integer.valueOf(ModelEq.deepHash(components)))
}

object PcaExpressions {
  def pca_project(c: Column, mean: Array[Double],
                  comps: Array[Array[Double]]): Column =
    ColumnBridge.column(PcaProject(ColumnBridge.expression(c), mean, comps))
}
