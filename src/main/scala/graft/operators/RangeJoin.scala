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
  * Pick `bucketWidth` near the typical interval length (see
  * [[suggestBucketWidth]]): wider buckets shrink the explode factor,
  * narrower buckets shrink the per-bucket candidate count. Numeric
  * domains only — for timestamps cast to epoch seconds first, or write
  * the naive SQL and let `plans/RangeJoinRewrite` plan it (it handles
  * timestamp/NTZ natively).
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

  /** Data-driven pick for `bucketWidth`: the median interval length (one
    * bounded driver-side aggregate over a t-digest sketch). Median — not
    * mean — so a few giant intervals don't inflate the width and pack the
    * whole point domain into a handful of buckets; the long tail instead
    * pays a proportionally larger explode factor, which is the right
    * trade (explode rows are cheap, hot buckets are not). Returns 1.0 on
    * empty/degenerate inputs so callers can pass the result straight
    * through.
    */
  def suggestBucketWidth(intervals: DataFrame, loCol: String,
                         hiCol: String): Double = {
    val m = intervals
      .where(col(loCol) < col(hiCol))
      .select(percentile_approx((col(hiCol) - col(loCol)).cast("double"),
        lit(0.5), lit(1000)).as("m"))
      .head()
    if (m.isNullAt(0) || m.getDouble(0) <= 0) 1.0 else m.getDouble(0)
  }

  /** Interval-overlap (interval × interval) join without a cross product:
    * pairs where `[l_lo, l_hi)` and `[r_lo, r_hi)` intersect.
    *
    * Both sides explode onto the fixed-width buckets they span; two
    * overlapping intervals share every bucket in the intersection of
    * their spans, so the bucket equi-join alone would emit each pair once
    * PER shared bucket. The ownership rule dedups without a distinct
    * pass: a pair is emitted only from the first bucket both cover —
    * `floor(max(l_lo, r_lo) / width)` — which every overlapping pair
    * covers exactly once. Null-bounded intervals drop (as in the raw
    * predicate); malformed `lo > hi` intervals are treated as EMPTY and
    * dropped pre-explode — note the raw SQL predicate
    * `l_lo < r_hi AND r_lo < l_hi` would still emit them against a
    * wide-enough partner, so filter or repair malformed rows upstream if
    * that behavior is wanted.
    *
    * Same scale calculus as `rangeJoin`: explode factor is
    * interval-length/width per row, per-bucket candidates are bounded by
    * interval density, and the join shuffles on the bucket id — never the
    * cross product. Pick `bucketWidth` near the typical interval length.
    */
  def overlapJoin(left: DataFrame, lLo: String, lHi: String,
                  right: DataFrame, rLo: String, rHi: String,
                  bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0)
    def exploded(df: DataFrame, lo: String, hi: String) =
      df.where(col(lo) <= col(hi)).withColumn("_bucket",
        explode(sequence(
          floor(col(lo) / bucketWidth).cast("long"),
          floor(col(hi) / bucketWidth).cast("long"))))
    exploded(left, lLo, lHi).join(exploded(right, rLo, rHi), Seq("_bucket"))
      .where(col(lLo) < col(rHi) && col(rLo) < col(lHi) &&
        col("_bucket") ===
          floor(greatest(col(lLo), col(rLo)) / bucketWidth).cast("long"))
      .drop("_bucket")
  }
}
