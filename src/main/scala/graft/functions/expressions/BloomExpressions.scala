package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a string column against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]] — the query half of the
  * Bloom semi-join reduction in
  * [[graft.functions.DedupFunctions.incrementalDedupBloom]].
  *
  * Model-carrying kernel, same pattern as the PQ/PCA expressions: the
  * trained sketch rides inside the plan (the filter is `Serializable`;
  * codegen re-exposes it via `addReferenceObj`), evaluation is one
  * Murmur3 pair per row over the column's UTF-8 bytes —
  * `mightContainBinary(utf8)` is bit-identical to the build side's
  * `putString` (both hash the UTF-8 encoding). No false negatives by
  * construction, so a negative probe PROVES absence from the filter's
  * input set.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs string, got $other")
  }
  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary(($c).getBytes())")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def bloomMightContain(c: Column, filter: BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), filter))
}
