package graft.functions.expressions

/** Structural equality for expressions keyed on Array model parameters
  * (centroid tables, codebooks, PCA bases). Scala case-class equality
  * over arrays is REFERENCE-based, so two plan copies carrying identical
  * model tables would never compare equal for Catalyst canonicalization
  * or common-subexpression elimination — each kernel expression overrides
  * equals/hashCode through these instead. The wrap-in-Array trick makes
  * `deepEquals` uniform over double[], double[][], and double[][][].
  */
private[expressions] object ModelEq {
  def deep(a: AnyRef, b: AnyRef): Boolean =
    java.util.Arrays.deepEquals(Array(a), Array(b))
  def deepHash(a: AnyRef): Int =
    java.util.Arrays.deepHashCode(Array[AnyRef](a))
}
