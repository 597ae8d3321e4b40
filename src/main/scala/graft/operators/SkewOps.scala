package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins at scale (SURVEY §7 / build-prompt:
  * "salting for skew, AQE for runtime re-plan").
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here) covers sort-merge joins; explicit salting remains the tool
  * when a single key dominates a hash join/aggregation beyond what split
  * partitions fix.
  */
object SkewOps {

  /** Salted equi-join: the large (skewed) side gets a deterministic salt in
    * `[0, salts)`; the small side is exploded ×salts so every (key, salt)
    * pair finds its match. One shuffle on (key, salt) with the hot key's
    * rows spread over `salts` partitions instead of one.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // deterministic per-row salt (hash of the full row, not rand(): keeps
    // retries/speculative tasks consistent)
    val largeS = large.withColumn("_salt",
      pmod(hash(struct(large.columns.toIndexedSeq.map(col): _*)), lit(salts)))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    largeS.join(smallS, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase (partial → final) aggregation with salting for skewed
    * group-by keys: groupBy(key, salt) pre-aggregates, then groupBy(key)
    * merges — the manual form of map-side combine when one key floods its
    * reducer. `aggs` maps output column name → (partial expr, merge expr
    * builder over the partial column).
    */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("_salt", pmod(hash(struct(df.columns.toIndexedSeq.map(col): _*)), lit(salts)))
      .groupBy(col(key), col("_salt")).count()
      .groupBy(col(key)).agg(sum("count").as("count"))
}
