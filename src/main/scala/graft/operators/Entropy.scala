package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-distribution entropy quality signals — the "is this document
  * natural text or generated/boilerplate noise" screens (CCNet, Gopher
  * use exactly these): very low entropy ⇒ repeated boilerplate, very
  * high distinct-ratio on a long doc ⇒ random-ish token soup.
  *
  * Determinism discipline (the [[Dsir]] recipe): Shannon entropy is
  * emitted UNNORMALIZED as `n·H = n·ln(n) − Σ_t c_t·ln(c_t)` where every
  * `ln` is of an exact integer and individually quantized to integer
  * micro-nats — the result is a pure integer sum (`ent_nunats`),
  * order- and partition-independent, replayable bit-exactly in SQL.
  * Downstream thresholds divide by `n_toks` (micro-nats per token).
  *
  * Scale shape: one exploded (doc, token) map-side-combinable count,
  * one per-doc aggregation — no window, no join beyond the empty-doc
  * restore, output one row per document.
  */
object Entropy {

  /** `floor(ln(c)·1e6 + 0.5)` for an exact-integer column. */
  private def lnUnats(c: Column): Column =
    floor(log(c.cast("double")) * 1e6 + 0.5).cast("long")

  /** Per-document word-entropy signals: `(idCol, n_toks, n_distinct,
    * distinct_bp, ent_nunats)`. Token-less documents emit zeros.
    */
  def wordEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("_tok"))
      .groupBy(col(idCol), col("_tok")).agg(count(lit(1)).as("_c"))
    val agg = tf.groupBy(col(idCol)).agg(
        sum(col("_c")).as("n_toks"),
        count(lit(1)).as("n_distinct"),
        sum(col("_c") * lnUnats(col("_c"))).as("_clnc"))
      .select(col(idCol), col("n_toks"), col("n_distinct"),
        TextFunctions.basisPoints(
          col("n_distinct").cast("double") / col("n_toks")).as("distinct_bp"),
        (col("n_toks") * lnUnats(col("n_toks")) - col("_clnc"))
          .as("ent_nunats"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        coalesce(col("distinct_bp"), lit(0L)).as("distinct_bp"),
        coalesce(col("ent_nunats"), lit(0L)).as("ent_nunats"))
  }
}
