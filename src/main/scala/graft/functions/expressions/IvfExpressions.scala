package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Native IVF coarse-quantizer kernels. The centroid table (cells × dim
  * doubles — a few KB) rides inside the expression and ships to executors
  * with the serialized plan via `addReferenceObj`, exactly like the PQ
  * codebooks. These replace the interpreted higher-order-function ranking
  * (per-centroid `aggregate(zip_with(...))` structs + `array_sort`) in the
  * assignment hot path: cell assignment is a FULL-CORPUS pass — the one
  * per-row cost of building or growing the inverted file — and belongs in
  * a tight codegen'd loop per the same rule that produced [[PqKernel]]
  * (measured: the interpreted ranking tripled the whole ann_ivf bench
  * family when it replaced the compiled Spark-ML predict).
  *
  * Distance semantics are IDENTICAL to the composed form (and to the
  * probe ranking in `ivfSearch`): squared L2 from the L2-NORMALIZED
  * vector to each (unit-trained) centroid, left-to-right accumulation,
  * ties broken to the smallest cell id.
  */
object IvfKernel {

  /** Cell ids of the `probes` nearest centroids to the (internally
    * normalized) vector, ascending by (squared L2 distance, cell id) —
    * probe 1 is exactly the assignment cell. `probes` clamps to the
    * centroid count, mirroring `slice`'s behavior in the composed form.
    */
  /** A vector whose dimension differs from the trained centroids must
    * fail LOUDLY (the same contract as PqAdcScore's subspace check):
    * prefix-distance assignment would silently place malformed-dim data
    * in arbitrary cells, and the composed zip_with parity form diverges
    * (null-padded distances) on exactly that input. The quantizer is a
    * long-lived artifact — a dim change means retrain, not truncation.
    */
  private def checkDim(v: Array[Double], cent: Array[Double]): Unit =
    if (v.length != cent.length)
      throw new IllegalArgumentException(
        s"ivf kernel: vector dim ${v.length} != trained centroid dim " +
          s"${cent.length} — the quantizer was trained on a different " +
          "embedding space; retrain (ivfTrain/ivfRetrain) before assigning")

  def rankCells(vec: ArrayData, cents: Array[Array[Double]], probes: Int): ArrayData = {
    val v = PqKernel.normalize(vec)
    val k = cents.length
    val p = math.min(probes, k)
    val bestD = Array.fill(p)(Double.MaxValue)
    val bestC = Array.fill(p)(Int.MaxValue)
    var j = 0
    while (j < k) {
      val cent = cents(j)
      checkDim(v, cent)
      val dim = cent.length
      var d = 0.0; var x = 0
      while (x < dim) { val t = v(x) - cent(x); d += t * t; x += 1 }
      if (d < bestD(p - 1) || (d == bestD(p - 1) && j < bestC(p - 1))) {
        var i = p - 1
        while (i > 0 && (bestD(i - 1) > d ||
            (bestD(i - 1) == d && bestC(i - 1) > j))) {
          bestD(i) = bestD(i - 1); bestC(i) = bestC(i - 1); i -= 1
        }
        bestD(i) = d; bestC(i) = j
      }
      j += 1
    }
    val out = new Array[Any](p)
    var i = 0
    while (i < p) { out(i) = bestC(i); i += 1 }
    new GenericArrayData(out)
  }

  /** Squared L2 distance from the (internally normalized) vector to its
    * nearest centroid — the quantization-error signal for the drift
    * monitor; same metric and tie rule as [[rankCells]].
    */
  def nearestD2(vec: ArrayData, cents: Array[Array[Double]]): Double = {
    val v = PqKernel.normalize(vec)
    var bestD = Double.MaxValue
    var j = 0
    while (j < cents.length) {
      val cent = cents(j)
      checkDim(v, cent)
      val dim = cent.length
      var d = 0.0; var x = 0
      while (x < dim) { val t = v(x) - cent(x); d += t * t; x += 1 }
      if (d < bestD) bestD = d
      j += 1
    }
    bestD
  }
}

case class IvfRankCells(child: Expression, centroids: Array[Array[Double]],
                        probes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"ivf_rank_cells needs array<double>, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    IvfKernel.rankCells(input.asInstanceOf[ArrayData], centroids, probes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("ivfCents", centroids, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.IvfKernel.rankCells($c, $cents, $probes)")
  }
  override protected def withNewChildInternal(newChild: Expression): IvfRankCells =
    copy(child = newChild)
  // structural (not reference) equality over the centroid table, so two
  // plan copies with identical centroids canonicalize/CSE together
  override def equals(o: Any): Boolean = o match {
    case r: IvfRankCells => r.child == child && r.probes == probes &&
      ModelEq.deep(r.centroids, centroids)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(probes),
      Integer.valueOf(ModelEq.deepHash(centroids)))
}

case class IvfNearestD2(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"ivf_nearest_d2 needs array<double>, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    IvfKernel.nearestD2(input.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("ivfCents", centroids, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.IvfKernel.nearestD2($c, $cents)")
  }
  override protected def withNewChildInternal(newChild: Expression): IvfNearestD2 =
    copy(child = newChild)
  override def equals(o: Any): Boolean = o match {
    case r: IvfNearestD2 => r.child == child &&
      ModelEq.deep(r.centroids, centroids)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(ModelEq.deepHash(centroids)))
}

object IvfExpressions {
  def ivf_rank_cells(c: Column, cents: Array[Array[Double]], probes: Int): Column =
    ColumnBridge.column(IvfRankCells(ColumnBridge.expression(c), cents, probes))
  def ivf_nearest_d2(c: Column, cents: Array[Array[Double]]): Column =
    ColumnBridge.column(IvfNearestD2(ColumnBridge.expression(c), cents))
}
