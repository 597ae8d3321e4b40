package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join without a cross product.
  *
  * Spark's planner turns a bare `p >= lo AND p < hi` join into a
  * broadcast-nested-loop / cartesian — O(|L|·|R|). The scalable
  * formulation buckets the domain: each interval is exploded onto the
  * fixed-width buckets it covers (cheap: intervals/width buckets each),
  * each point owns exactly ONE bucket, and the join becomes an equi-join
  * on the bucket id followed by the exact containment filter. Each
  * matching (point, interval) pair surfaces exactly once — the point's
  * bucket is unique — so no dedup pass is needed.
  *
  * Pick `bucketWidth` near the typical interval length: wider buckets
  * shrink the explode factor, narrower buckets shrink the per-bucket
  * candidate count.
  */
object RangeJoin {

  def rangeJoin(points: DataFrame, pointCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                bucketWidth: Double,
                joinType: String = "inner"): DataFrame = {
    require(bucketWidth > 0)
    val p = points.withColumn("_bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val iv = intervals.withColumn("_bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    p.join(iv, Seq("_bucket"), joinType)
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bucket")
  }
}
