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
}
