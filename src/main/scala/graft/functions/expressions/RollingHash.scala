package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash of a string — a native Catalyst
  * expression (no UDF boxing; stays inside whole-stage codegen via a static
  * call on the raw `UTF8String` bytes).
  *
  * Two 31-bit Rabin-Karp hashes over the UTF-8 bytes with different
  * base/modulus pairs, packed into one long — collision-resistant enough
  * for document fingerprinting while staying in overflow-free long
  * arithmetic.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash needs a string argument, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.RollingHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  private val M1 = 2147483647L  // 2^31 - 1
  private val M2 = 2147483629L
  private val B1 = 257L
  private val B2 = 131L

  /** Static entry shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i) & 0xffL
      h1 = (h1 * B1 + c) % M1
      h2 = (h2 * B2 + c) % M2
      i += 1
    }
    (h1 << 31) | h2
  }

  def rolling_hash(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
  }
}
