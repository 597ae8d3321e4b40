package graft.operators

import graft.functions.DedupFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation — keep/drop is a pure
  * function of (salt, id) through the shared 60-bit hash: reproducible
  * across runs, engines, partitionings, and cluster sizes (no RNG state,
  * unlike `df.sample`), mirrorable in oracle SQL, and stable under corpus
  * growth (a kept id stays kept when new data arrives). Per-row filter —
  * no shuffle, fuses into the scan.
  */
object Sampling {

  /** Keep predicate: hash60(salt|id) mod 10000 < rateBp (basis points). */
  def keep(id: Column, rateBp: Int, salt: String): Column =
    DedupFunctions.hash60(concat_ws("|", lit(salt), id.cast("string")))
      .%(10000) < rateBp

  /** Uniform deterministic sample at `rateBp`/10000. */
  def deterministicSample(df: DataFrame, idCol: String, rateBp: Int,
                          salt: String = "sample"): DataFrame =
    df.where(keep(col(idCol), rateBp, salt))

  /** Stratified deterministic sample: per-stratum rates (downsample
    * dominant sources/languages, keep the tail), `defaultBp` elsewhere.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       ratesBp: Map[String, Int], defaultBp: Int,
                       salt: String = "sample"): DataFrame = {
    val rate = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.where(DedupFunctions.hash60(
      concat_ws("|", lit(salt), col(idCol).cast("string"))).%(10000) < rate)
  }

  /** Deterministic TOKEN-BUDGET sample — "give me ~N tokens of this
    * corpus", the knob a training-data mix actually turns (doc-rate
    * sampling over-represents long documents). Docs are ranked by the
    * seeded 60-bit priority hash and taken greedily in priority order
    * while the running token total stays ≤ `budgetTokens`; the kept set
    * is a pure function of (salt, ids) — stable across runs, engines, and
    * cluster sizes, and mirrorable in oracle SQL.
    *
    * Scale shape: the naive form is ONE GLOBAL cumulative-sum window —
    * a single-reducer sort that dies at 100 TB. Instead the priority
    * space is range-bucketed (top 12 bits → 4096 buckets): one map-side
    * aggregate sums tokens per bucket, the tiny (≤4096-row) histogram
    * finds the boundary bucket on the driver, every bucket strictly below
    * it is kept with NO sort at all, and only the boundary bucket (~1/4096
    * of the corpus) pays the exact cumulative window. Same greedy result,
    * no global sort.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, tokenCountCol: String,
                        budgetTokens: Long, salt: String = "budget"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prio = DedupFunctions.hash60(
      concat_ws("|", lit(salt), col(idCol).cast("string")))
    val bucketed = df.withColumn("_prio", prio)
      .withColumn("_bkt", shiftright(col("_prio"), 48).cast("int"))
    // tiny bounded histogram: ≤4096 rows to the driver
    val hist = bucketed.groupBy(col("_bkt"))
      .agg(sum(col(tokenCountCol)).as("_toks"))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    var acc = 0L
    var boundary = -1            // first bucket whose full inclusion overflows
    var below = 0L               // tokens in buckets strictly before it
    hist.foreach { case (b, t) =>
      if (boundary < 0) {
        if (acc + t > budgetTokens) { boundary = b; below = acc }
        else acc += t
      }
    }
    if (boundary < 0)
      bucketed.drop("_prio", "_bkt") // whole corpus fits the budget
    else {
      val whole = bucketed.where(col("_bkt") < boundary)
      // exact greedy inside the single boundary bucket: window over ~1/4096
      // of the corpus, keyed by priority (hash ties broken by id)
      val cumW = Window.orderBy(col("_prio"), col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val edge = bucketed.where(col("_bkt") === boundary)
        .withColumn("_cum", sum(col(tokenCountCol)).over(cumW))
        .where(col("_cum") + lit(below) <= budgetTokens)
        .drop("_cum")
      whole.unionByName(edge).drop("_prio", "_bkt")
    }
  }
}
