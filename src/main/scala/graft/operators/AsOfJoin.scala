package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (time-series) join: for each left row, the most recent right row
  * with `rightTime <= leftTime` in the same key group, optionally within a
  * tolerance.
  *
  * Spark-first formulation (build-prompt custom-operator case (a): compose
  * existing ops): UNION both sides tagged by origin, ONE shuffle+sort per
  * key group, then a running `last(right_payload, ignoreNulls)` window —
  * O(n log n) with no per-row lookups, no range explosion, AQE-compatible.
  * This is the standard scalable as-of pattern (vs. a broadcast
  * interval-join which explodes on wide tolerances); it would become a
  * custom `SparkPlan` only if the sort needed fusing with a custom state
  * layout.
  *
  * Output: every left column, plus the matched right payload columns
  * (null when no match) — right columns must not collide with left ones
  * (pre-rename on the caller side).
  */
object AsOfJoin {

  def asOfJoin(left: DataFrame, right: DataFrame, on: Seq[String],
               leftTime: String, rightTime: String,
               tolerance: Option[Column] = None): DataFrame = {
    val leftPayload = left.columns.filterNot(on.contains).toSeq
    val rightPayload = right.columns.filterNot(on.contains).toSeq
    require(leftPayload.intersect(rightPayload).isEmpty,
      s"overlapping non-key columns: ${leftPayload.intersect(rightPayload).mkString(",")}")

    val rStructType = StructType(right.select(rightPayload.map(col): _*).schema.fields)

    val lhs = left.select(
      on.map(col) ++ Seq(
        col(leftTime).as("_t"), lit(1).as("_src"),
        struct(leftPayload.map(col): _*).as("_lpay"),
        lit(null).cast(rStructType).as("_rpay")): _*)
    val rhs = right.select(
      on.map(col) ++ Seq(
        col(rightTime).as("_t"), lit(0).as("_src"),
        lit(null).cast(StructType(left.select(leftPayload.map(col): _*).schema.fields)).as("_lpay"),
        struct(rightPayload.map(col): _*).as("_rpay")): _*)

    // right rows sort BEFORE left rows at equal time (_src 0 < 1), so
    // `rightTime == leftTime` matches (ASOF >= semantics)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_t").asc, col("_src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lhs.unionByName(rhs)
      .withColumn("_match", last(col("_rpay"), ignoreNulls = true).over(w))
      .where(col("_src") === 1)

    // tolerance: an interval (timestamp times) or numeric delta — the match
    // must satisfy rightTime >= leftTime - tolerance, else null
    val withTolerance = tolerance match {
      case Some(tol) =>
        matched.withColumn("_match",
          when(col(s"_match.$rightTime") >= col("_t") - tol, col("_match")))
      case None => matched
    }

    val projected = on.map(col) ++
      Seq(col("_t").as(leftTime)) ++
      leftPayload.map(c => col(s"_lpay.$c").as(c)) ++
      rightPayload.map(c => col(s"_match.$c").as(c))
    withTolerance.select(projected: _*)
  }
}
